"""Device-transform vs host-transform tolerance contract.

The HOST path (``to_rgb8`` / ``to_uint16_extended``, xp=numpy) is the
bit-exact golden path: it keeps the reference's float32 AAN operation
order and reproduces the C# reference's committed fixtures bit-for-bit
(tests/test_golden_fixtures.py).

The DEVICE path (``to_rgb8_device`` and the batched/stacked pipelines)
runs the same arithmetic as one jitted XLA program. XLA's codegen for a
given shape may shift the float32 IDCT output by 1 ULP relative to
numpy (FMA contraction / vectorization order), and
``decode_stage.dequantize_idct_shift`` rounds with rint — so a sample
whose true IDCT value sits exactly on a .5 razor edge can round the
other way. Measured on photographic content (lake.jpg re-encoded q85):
XLA:CPU flips 3 of 2.36M pixels (maxabs 1); the TPU Pallas folded-
matmul path flips 43 (~1.8e-5, maxabs 2 RGB levels after the chroma
matrix — the Cb->B coefficient 1.772 amplifies a 1-LSB chroma tie to
2). Example: the first differing pixel's Cr sample computes to
-7.4999995 in numpy and the other side of -7.5 in the full-shape XLA
program.

This is NOT a per-backend tolerance the serving contract hides behind:
within one compiled program the output is deterministic, and the
stacked batch program agrees with the single-image device program
exactly on this asset. The tolerance below pins the cross-program
contract tightly enough that any real logic bug (wrong quant table,
off-by-one block index, upsample misalignment — all of which move
whole blocks by many levels) fails loudly, while razor-edge rint ties
do not flake the suite.
"""

import numpy as np
import pytest

import jpeglibrary_tpu as jt
from jpeglibrary_tpu.models.decoder import JpegDecoder

LAKE = "/root/reference/tests/Assets/baseline/lake.jpg"


@pytest.fixture(scope="module")
def photo_blob():
    rgb = jt.decode(open(LAKE, "rb").read()).to_rgb8()
    return jt.encode_rgb(rgb, 85, optimize_coding=True)


def _decode(blob, **kw):
    dec = JpegDecoder()
    dec.set_input(blob)
    return dec.decode(**kw)


def test_device_transform_within_one_sample_lsb(photo_blob):
    res = _decode(photo_blob, sparse_direct=True)
    host = res.to_rgb8()
    dev = np.moveaxis(np.asarray(res.to_rgb8_device(sparse=True)), 0, -1)
    diff = dev.astype(np.int32) - host.astype(np.int32)
    n_diff = int((diff != 0).sum())
    # Razor-edge rint ties only: tiny count, bounded magnitude. A real
    # transform bug moves 8x8 blocks by many levels and trips both.
    assert abs(diff).max() <= 2, f"device-host diff exceeds 1 sample LSB: {abs(diff).max()}"
    assert n_diff <= diff.size * 1e-4, f"{n_diff}/{diff.size} pixels differ"


def test_batched_program_matches_single_device_program(photo_blob):
    """The stacked (vmapped) transform and the single-image device
    transform are both XLA programs over the same ops; they agree
    exactly on this asset — grouping must not change values."""
    from jpeglibrary_tpu.parallel.batch import decode_batch_rgb

    res = _decode(photo_blob, sparse_direct=True)
    dev = np.moveaxis(np.asarray(res.to_rgb8_device(sparse=True)), 0, -1)
    batch = np.asarray(decode_batch_rgb([photo_blob])[0])
    np.testing.assert_array_equal(batch, dev)


def test_device_program_is_deterministic(photo_blob):
    res = _decode(photo_blob, sparse_direct=True)
    a = np.asarray(res.to_rgb8_device(sparse=True))
    b = np.asarray(res.to_rgb8_device(sparse=True))
    np.testing.assert_array_equal(a, b)


def test_host_golden_path_unaffected():
    """The golden-parity path stays bit-exact vs the reference's
    committed fixture (the tolerance above is device-path-only)."""
    from jpeglibrary_tpu.utils.fixtures import load_expected_buffer

    res = jt.decode(open(LAKE, "rb").read())
    exp = load_expected_buffer(LAKE, 3)[..., :3]
    assert (res.to_uint16_extended() == exp).all()
