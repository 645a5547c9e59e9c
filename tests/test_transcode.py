"""Universal lossless transcoder (models/transcode): any decodable
input -> any entropy coding, coefficient/sample-exact. Beyond the
reference, whose only transcoder (JpegOptimizer) takes baseline input
only and re-optimizes Huffman tables."""

import numpy as np
import pytest

import jpeglibrary_tpu as jt

DCT_INPUTS = [
    "baseline/lake.jpg",
    "baseline/cramps.jpg",                       # grayscale
    "huffman_sequential/testorig12.jpg",         # 12-bit
    "huffman_progressive/progress.jpg",          # SOF2 input
    "arithmetic_sequential/zackthecat_arith.jpg",
    "arithmetic_progressive/yellowcat_progressive_arith.jpg",
]
MODES = ["optimized", "optimal", "progressive", "arithmetic", "arithmetic-progressive"]


@pytest.fixture(scope="module")
def native_lib():
    from jpeglibrary_tpu.native import build

    try:
        return build.load_library()
    except ImportError as exc:
        pytest.skip(f"native scanner unavailable: {exc}")


def _same(a, b):
    for k in a.coefficients:
        np.testing.assert_array_equal(a.coefficients[k], b.coefficients[k])
    for k in a.quant:
        np.testing.assert_array_equal(
            a.quant[k].astype(np.int64), b.quant[k].astype(np.int64)
        )


@pytest.mark.parametrize("rel", DCT_INPUTS, ids=DCT_INPUTS)
@pytest.mark.parametrize("mode", MODES)
def test_transcode_exact(native_lib, assets_dir, rel, mode):
    data = (assets_dir / rel).read_bytes()
    src = jt.decode(data)
    out = jt.transcode(data, mode)
    _same(src, jt.decode(out))


@pytest.mark.parametrize("i", range(1, 8))
def test_lossless_transcode_exact(native_lib, assets_dir, i):
    """All 7 subsampled (_s22) lossless fixtures re-encode predictively
    and decode back sample-exact."""
    data = (assets_dir / f"huffman_lossless/lossless{i}_s22.jpg").read_bytes()
    src = jt.decode(data)
    out = jt.transcode(data, predictor=1)
    dst = jt.decode(out)
    for k in src.samples:
        np.testing.assert_array_equal(src.samples[k], dst.samples[k])
    for k in src.planes:
        np.testing.assert_array_equal(src.planes[k], dst.planes[k])


def test_lossless_best_predictor(native_lib, assets_dir):
    data = (assets_dir / "huffman_lossless/lossless4_s22.jpg").read_bytes()
    best = jt.transcode(data)  # predictor=None: pick the smallest
    fixed = [len(jt.transcode(data, predictor=s)) for s in range(1, 8)]
    assert len(best) == min(fixed)


def test_transcode_compression_ranking(native_lib, assets_dir):
    """Adaptive arithmetic should beat optimized Huffman on a photo."""
    data = (assets_dir / "baseline/lake.jpg").read_bytes()
    assert len(jt.transcode(data, "arithmetic")) < len(jt.transcode(data, "optimized"))
    assert len(jt.transcode(data, "arithmetic-progressive")) < len(
        jt.transcode(data, "arithmetic")
    )
