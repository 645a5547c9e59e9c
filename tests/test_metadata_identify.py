"""Identify() parity tests.

Mirrors the reference MetadataIdentifyTests
(tests/JpegLibrary.Tests/Decoder/MetadataIdentifyTests.cs:19-154): width,
height, component count, precision, estimated quality (rounded), and
consumed stream length for 9 assets across all coding modes.
"""

import pytest

from jpeglibrary_tpu import JpegDecoder

CASES = [
    ("baseline/cramps.jpg", 800, 607, 1, 8, 90, 137_766),
    ("baseline/HETissueSlide.jpg", 2048, 2048, 3, 8, 75, 783_426),
    ("huffman_sequential/testorig12.jpg", 227, 149, 3, 12, 75, 12_394),
    ("huffman_progressive/yellowcat_progressive_restart.jpg", 720, 540, 3, 8, 75, 45_703),
    ("huffman_progressive/progress.jpg", 341, 486, 3, 8, 85, 44_884),
    ("huffman_lossless/lossless1_s22.jpg", 128, 128, 3, 8, 0, 15_344),
    ("arithmetic_sequential/yellowcat_arith_restart.jpg", 720, 540, 3, 8, 75, 42_694),
    ("arithmetic_progressive/yellowcat_progressive_arith.jpg", 720, 540, 3, 8, 75, 42_260),
    ("arithmetic_progressive/yellowcat_progressive_arith_restart.jpg", 720, 540, 3, 8, 75, 42_526),
]


@pytest.mark.parametrize(
    "rel,width,height,ncomp,precision,quality,stream_size",
    CASES,
    ids=[c[0] for c in CASES],
)
def test_identify(assets_dir, rel, width, height, ncomp, precision, quality, stream_size):
    data = (assets_dir / rel).read_bytes()
    decoder = JpegDecoder()
    decoder.set_input(data)
    info = decoder.identify(load_quantization_tables=True)

    assert info.width == width
    assert info.height == height
    assert info.number_of_components == ncomp
    assert info.precision == precision
    if quality > 0:
        estimated = decoder.estimate_quality()
        assert estimated is not None
        # xUnit Assert.Equal(expected, actual, 0) rounds to 0 decimals.
        assert round(estimated) == quality
    if stream_size > 0:
        assert info.consumed_bytes == stream_size
