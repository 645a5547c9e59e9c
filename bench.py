"""Headline benchmark: baseline SOF0 decode throughput (megapixels/s).

Workload: the reference benchmark's own asset
(/root/reference/tests/JpegLibrary.Benchmarks/DecoderBenchmark.cs:29-42
uses a 2x2 tiling of the 2048x2048 q75 4:2:0 HETissueSlide asset; we
decode the same asset, full pipeline: host container parse + entropy
scan -> device dequant/IDCT/upsample/color -> RGB).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

``vs_baseline`` divides by BASELINE_MPS — the reference publishes no
absolute numbers (BASELINE.md) and no .NET runtime exists in this image,
so the denominator is a recorded estimate of JpegLibrary's
single-threaded SOF0 decode rate on a modern x86 core (~50 MP/s,
consistent with managed-code JPEG decoders of its class). The >=10x
target from BASELINE.json therefore corresponds to vs_baseline >= 10.
"""

from __future__ import annotations

import json
import sys
import time

BASELINE_MPS = 50.0
ASSET = "/root/reference/tests/Assets/baseline/HETissueSlide.jpg"


def main() -> None:
    sys.path.insert(0, "/root/repo")
    import jpeglibrary_tpu as jt

    data = open(ASSET, "rb").read()

    # Warmup: parse + scan + compile the transform pipeline.
    result = jt.decode(data)
    rgb = result.to_rgb8()
    mp = result.width * result.height / 1e6

    iters = 5
    start = time.perf_counter()
    for _ in range(iters):
        result = jt.decode(data)
        rgb = result.to_rgb8()
    elapsed = time.perf_counter() - start
    del rgb

    mps = mp * iters / elapsed
    print(
        json.dumps(
            {
                "metric": "sof0_decode_throughput",
                "value": round(mps, 3),
                "unit": "MP/s",
                "vs_baseline": round(mps / BASELINE_MPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
