"""Sub-8-bit sample precision (lossless SOF3 admits P = 2..16,
T.81 Table B.14). The reference ships a dedicated <8-bit output writer
(/root/reference/apps/JpegDecode/JpegBufferOutputWriterLessThan8Bit.cs)
and the test fixtures' 16-bit extension
(tests/JpegLibrary.Tests/Utils/JpegExtendingOutputWriter.cs:83-118);
these tests pin the capability end to end: P in {2, 4, 7} encode ->
decode bit-exact, plus the bit-replication semantics of to_uint8 /
to_uint16_extended against an independent scalar re-implementation of
the reference's ExpandBits."""

import numpy as np
import pytest

import jpeglibrary_tpu as jt
from jpeglibrary_tpu.models.lossless import encode_lossless


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(41)


def _expand_bits_ref(value: int, bit_count: int, target: int) -> int:
    """Scalar transliteration of ExpandBits
    (JpegBufferOutputWriterLessThan8Bit.cs:76-94 for target 8;
    JpegExtendingOutputWriter.cs:83-118 for target 16)."""
    bits = value
    current = bit_count
    while current < target:
        bits = (bits << bit_count) | bits
        current += bit_count
    if current > target:
        bits >>= bit_count
        current -= bit_count
        remaining = target - current
        bits = (bits << remaining) | (bits & ((1 << remaining) - 1))
    return bits


@pytest.mark.parametrize("precision", [2, 4, 7])
@pytest.mark.parametrize("predictor", [1, 4])
def test_lossless_roundtrip_bit_exact(rng, precision, predictor):
    maxv = (1 << precision) - 1
    plane = rng.integers(0, maxv + 1, (37, 61), dtype=np.uint16)
    data = encode_lossless(plane, precision=precision, predictor=predictor)
    res = jt.decode(data)
    assert res.precision == precision
    got = res.planes[0]
    assert np.array_equal(got, plane.astype(np.int32))


@pytest.mark.parametrize("precision", [2, 4, 7])
def test_lossless_roundtrip_color_restart(rng, precision):
    maxv = (1 << precision) - 1
    img = rng.integers(0, maxv + 1, (25, 43, 3), dtype=np.uint16)
    data = encode_lossless(
        img, precision=precision, predictor=1, restart_interval=43
    )
    res = jt.decode(data)
    for c in range(3):
        assert np.array_equal(res.planes[c], img[..., c].astype(np.int32)), c


@pytest.mark.parametrize("precision", [2, 3, 4, 5, 6, 7])
def test_to_uint8_bit_replication(rng, precision):
    maxv = (1 << precision) - 1
    plane = rng.integers(0, maxv + 1, (16, 24), dtype=np.uint16)
    res = jt.decode(encode_lossless(plane, precision=precision))
    got = res.to_uint8()[..., 0]
    want = np.vectorize(
        lambda v: _expand_bits_ref(int(v), precision, 8)
    )(plane).astype(np.uint8)
    assert np.array_equal(got, want)
    # extremes map to the full 8-bit range
    assert _expand_bits_ref(0, precision, 8) == 0
    assert _expand_bits_ref(maxv, precision, 8) == 255


@pytest.mark.parametrize("precision", [2, 4, 7])
def test_to_uint16_extended_bit_replication(rng, precision):
    maxv = (1 << precision) - 1
    plane = rng.integers(0, maxv + 1, (16, 24), dtype=np.uint16)
    res = jt.decode(encode_lossless(plane, precision=precision))
    got = res.to_uint16_extended()[..., 0]
    want = np.vectorize(
        lambda v: _expand_bits_ref(int(v), precision, 16)
    )(plane).astype(np.uint16)
    assert np.array_equal(got, want)
    assert _expand_bits_ref(maxv, precision, 16) == 0xFFFF


@pytest.mark.parametrize("precision", [2, 4, 7])
def test_identify_reports_sub8_precision(rng, precision):
    from jpeglibrary_tpu.models.decoder import JpegDecoder

    plane = rng.integers(0, 1 << precision, (20, 30), dtype=np.uint16)
    dec = JpegDecoder()
    dec.set_input(encode_lossless(plane, precision=precision))
    info = dec.identify()
    assert info.precision == precision
    assert (info.width, info.height) == (30, 20)


def test_point_transform_sub8(rng):
    """Pt > 0 at P=4: the decoder outputs the POINT-TRANSFORMED sample
    values unshifted, exactly like the reference lossless decoder
    (JpegHuffmanLosslessScanDecoder.cs writes the decoded samples with
    no << Pt back-shift; T.81 leaves inverse point transform to the
    application in lossless mode)."""
    plane = rng.integers(0, 16, (19, 23), dtype=np.uint16)
    data = encode_lossless(plane, precision=4, predictor=1, point_transform=1)
    res = jt.decode(data)
    want = plane.astype(np.int32) >> 1
    assert np.array_equal(res.planes[0], want)
