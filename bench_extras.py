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

    for name, rel in [
        ("progressive_decode", "huffman_progressive/yellowcat_progressive_restart.jpg"),
        ("arithmetic_decode", "arithmetic_sequential/yellowcat_arith_restart.jpg"),
        ("lossless_decode", "huffman_lossless/lossless1_s22.jpg"),
    ]:
        d = open(f"/root/reference/tests/Assets/{rel}", "rb").read()
        r = jt.decode(d)
        m = r.width * r.height / 1e6
        t = _median(lambda: jt.decode(d))
        print(json.dumps({"metric": f"{name}_throughput", "value": round(m / t, 2), "unit": "MP/s"}))


if __name__ == "__main__":
    main()
