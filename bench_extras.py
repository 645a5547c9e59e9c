"""Supplementary benchmarks (encode, optimize, per-mode decode).

Not the driver headline (bench.py prints the single decode line); this
script documents the other pipelines' throughput. One JSON line per
metric.
"""

from __future__ import annotations

import json
import sys
import time


def _median(f, n=5):
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        f()
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[n // 2]


def main() -> None:
    sys.path.insert(0, "/root/repo")
    import numpy as np

    import jpeglibrary_tpu as jt

    asset = "/root/reference/tests/Assets/baseline/HETissueSlide.jpg"
    data = open(asset, "rb").read()
    base = jt.decode(data)
    rgb = base.to_rgb8()
    mp = base.width * base.height / 1e6

    jt.encode_rgb(rgb, 75)  # warm
    t = _median(lambda: jt.encode_rgb(rgb, 75))
    print(json.dumps({"metric": "sof0_encode_throughput", "value": round(mp / t, 2), "unit": "MP/s"}))

    t = _median(lambda: jt.encode_rgb(rgb, 75, optimize_coding=True))
    print(json.dumps({"metric": "sof0_encode_optimized_throughput", "value": round(mp / t, 2), "unit": "MP/s"}))

    t = _median(lambda: jt.optimize(data))
    print(json.dumps({"metric": "optimizer_throughput", "value": round(mp / t, 2), "unit": "MP/s"}))

    # Large synthesized mode assets (>= 4 MP) so per-mode numbers are
    # not host-overhead-dominated: progressive via PIL's SOF2 encoder,
    # lossless via our own SOF3 encoder (tiny committed assets kept for
    # reference).
    from jpeglibrary_tpu.models.progressive_encoder import encode_progressive_rgb

    # Restart seams give the progressive scanners their parallel axis.
    big_prog = encode_progressive_rgb(rgb, 75, restart_interval=64)

    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(rgb).save(buf, "JPEG", quality=75, progressive=True, subsampling=2)
    big_prog_pil = buf.getvalue()

    from jpeglibrary_tpu.models.lossless import encode_lossless

    # One MCU row per restart segment: the parallel seam the
    # restart-parallel lossless decoder exploits.
    big_lossless = encode_lossless(rgb, predictor=1, restart_interval=2048)

    big_arith = jt.encode_rgb(rgb, 75, arithmetic=True, restart_interval=32)

    cases = [
        ("progressive_decode", big_prog, None),
        ("progressive_decode_norestart", big_prog_pil, None),
        ("lossless_decode", big_lossless, None),
        ("arithmetic_decode", big_arith, None),
        ("progressive_decode_small", None, "huffman_progressive/yellowcat_progressive_restart.jpg"),
        ("arithmetic_decode_small", None, "arithmetic_sequential/yellowcat_arith_restart.jpg"),
        ("lossless_decode_small", None, "huffman_lossless/lossless1_s22.jpg"),
    ]
    for name, d, rel in cases:
        if d is None:
            d = open(f"/root/reference/tests/Assets/{rel}", "rb").read()
        r = jt.decode(d)
        m = r.width * r.height / 1e6
        t = _median(lambda: jt.decode(d))
        print(json.dumps({"metric": f"{name}_throughput", "value": round(m / t, 2), "unit": "MP/s"}))


if __name__ == "__main__":
    main()
