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


def test_transcode_grayscale_reduction():
    """jpegtran -grayscale: luma blocks pass through untouched, so the
    gray output's decode equals the input's Y plane bit-exactly."""
    import numpy as np

    import jpeglibrary_tpu as jt

    rng = np.random.default_rng(30)
    rgb = np.clip(
        np.linspace(0, 255, 130)[None, :, None]
        + rng.normal(0, 15, (75, 130, 3)),
        0, 255,
    ).astype(np.uint8)
    for subsampling in ("420", "444"):
        src = jt.encode_rgb(rgb, 85, subsampling=subsampling)
        out = jt.transcode(src, grayscale=True)
        res = jt.decode(out)
        assert len(res.planes) == 1
        y_src = np.asarray(jt.decode(src).to_uint8())[..., 0]
        y_out = np.asarray(res.to_uint8())[..., 0]
        np.testing.assert_array_equal(y_out, y_src)
    # progressive output mode too
    out = jt.transcode(src, "progressive", grayscale=True)
    y_out = np.asarray(jt.decode(out).to_uint8())[..., 0]
    np.testing.assert_array_equal(y_out, y_src)
    # lossless input
    from jpeglibrary_tpu.models.lossless import encode_lossless

    ll = encode_lossless(rgb, predictor=2)
    out = jt.transcode(ll, grayscale=True)
    np.testing.assert_array_equal(
        np.asarray(jt.decode(out).to_uint8())[..., 0], rgb[..., 0]
    )
