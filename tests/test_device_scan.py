"""Device entropy-scan experiment (ops/device_scan.py): the
while_loop-over-restart-segments baseline Huffman decoder must be
bit-exact vs the host scanner. (The performance verdict lives in
BASELINE.md; this pins correctness so the experiment stays honest.)"""

import numpy as np
import pytest

import jpeglibrary_tpu as jt

pytest.importorskip("jax")


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(51)


def _segment_truth(data, geo, ri):
    """Host decode re-laid-out as per-segment MCU-order dense rows."""
    ref = jt.decode(data)
    bpm = sum(c.h * c.v for c in geo.components)
    cpm = 64 * bpm
    per_mcu = np.zeros(
        (geo.mcus_per_column * geo.mcus_per_line, cpm), np.int32
    )
    off = 0
    for c in geo.components:
        size = c.h * c.v * 64
        blk = ref.coefficients[c.component_index].astype(np.int32)
        blk = (
            blk.reshape(geo.mcus_per_column, c.v, geo.mcus_per_line, c.h, 64)
            .transpose(0, 2, 1, 3, 4)
            .reshape(-1, size)
        )
        per_mcu[:, off : off + size] = blk
        off += size
    total = per_mcu.shape[0]
    ri = ri if ri > 0 else total
    return [per_mcu[i : i + ri].reshape(-1) for i in range(0, total, ri)]


@pytest.mark.parametrize(
    "sub,q,ri",
    [("420", 75, 2), ("444", 90, 3), ("422", 80, 0)],
)
def test_device_scan_bit_exact(rng, sub, q, ri):
    from jpeglibrary_tpu.ops.device_scan import decode_baseline_device

    rgb = np.clip(
        np.linspace(0, 255, 96)[None, :, None] + rng.normal(0, 30, (64, 96, 3)),
        0, 255,
    ).astype(np.uint8)
    data = jt.encode_rgb(rgb, q, subsampling=sub, restart_interval=ri)
    out, geo = decode_baseline_device(data)
    out = np.asarray(out)
    for i, seg in enumerate(_segment_truth(data, geo, ri)):
        assert np.array_equal(out[i, : seg.shape[0]], seg), (sub, q, ri, i)


def test_device_scan_gray_noise(rng):
    from jpeglibrary_tpu.ops.device_scan import decode_baseline_device

    g = rng.integers(0, 256, (48, 80), dtype=np.uint8)
    data = jt.encode_gray(g, 85, restart_interval=4)
    out, geo = decode_baseline_device(data)
    out = np.asarray(out)
    for i, seg in enumerate(_segment_truth(data, geo, 4)):
        assert np.array_equal(out[i, : seg.shape[0]], seg), i
