"""Scaling-efficiency harness: sharded batch transform over an
N-device mesh (BASELINE.json: >= 80% frames/s efficiency at 1 chip,
1 host, and N >= 2 hosts).

On this single-chip image, the mesh is emulated with N virtual CPU
devices (XLA_FLAGS=--xla_force_host_platform_device_count), which
shares one physical CPU across all N shards — so the number measured
here is the *overhead* of sharded execution (partitioning + the
histogram all-reduce), not real-chip speedup: per-device FLOPs drop as
1/N while the host's total compute stays constant, so ideal virtual
scaling is flat wall time. On real chips the same program distributes
per-device work onto N separate chips; the collective traffic (the
[4, 256] true-symbol-histogram psum + zero-halo stripes + the DC-diff
boundary permute) is negligible vs ICI bandwidth.

Usage: python bench_scaling.py  (prints one JSON line per N)
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    sys.path.insert(0, "/root/repo")

    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from jpeglibrary_tpu.parallel.sharding import make_mesh, make_sharded_full_step
    from jpeglibrary_tpu.syntax.quantization import (
        STANDARD_CHROMINANCE_ZIGZAG,
        STANDARD_LUMINANCE_ZIGZAG,
    )

    rng = np.random.default_rng(0)
    batch, hb, wb = 8, 64, 64  # 8 x 0.26 MP = 2.1 MP per step
    y = rng.integers(-128, 128, size=(batch, hb, wb, 64), dtype=np.int16)
    cb = rng.integers(-64, 64, size=(batch, hb // 2, wb // 2, 64), dtype=np.int16)
    cr = rng.integers(-64, 64, size=(batch, hb // 2, wb // 2, 64), dtype=np.int16)
    qt_l = STANDARD_LUMINANCE_ZIGZAG.astype(np.int32)
    qt_c = STANDARD_CHROMINANCE_ZIGZAG.astype(np.int32)
    mp_per_step = batch * hb * wb * 64 / 1e6

    results = {}
    for n in (1, 2, 4, 8):
        mesh = make_mesh(n, stripe=2 if n >= 2 else 1)
        step = make_sharded_full_step(mesh)
        out = step(y, cb, cr, qt_l, qt_c)
        jax.block_until_ready(out)
        iters = 5
        t0 = time.perf_counter()
        for _ in range(iters):
            out = step(y, cb, cr, qt_l, qt_c)
            jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        results[n] = mp_per_step / dt
        print(
            json.dumps(
                {
                    "metric": "sharded_transform_throughput",
                    "devices": n,
                    "value": round(results[n], 2),
                    "unit": "MP/s",
                    "overhead_vs_1dev": round(results[1] / results[n], 3),
                }
            )
        )


if __name__ == "__main__":
    main()
