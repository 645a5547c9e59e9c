"""Encoder tests: round-trip PSNR through our own decoder, external
cross-validation via PIL, and optimize-coding size gains.

The reference has no committed encoder goldens (SURVEY.md §4: the
encoder is exercised via benchmarks and the optimizer round-trip), so
the gates here are behavioral: valid streams, high round-trip PSNR,
optimized tables strictly smaller, package-merge cost <= Annex-K cost.
"""

import io

import numpy as np
import pytest

import jpeglibrary_tpu as jt
from jpeglibrary_tpu.models.encoder import encode_gray, encode_rgb
from jpeglibrary_tpu.models.huffman_builder import (
    HuffmanTableBuilder,
    _package_merge_lengths,
    _standard_lengths,
)


@pytest.fixture(scope="module")
def lake_rgb(assets_dir):
    data = (assets_dir / "baseline/lake.jpg").read_bytes()
    return jt.decode(data).to_rgb8()


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10 * np.log10(255.0**2 / mse)


@pytest.mark.parametrize("subsampling", ["420", "444"])
def test_roundtrip_psnr(lake_rgb, subsampling):
    enc = encode_rgb(lake_rgb, 75, subsampling=subsampling)
    rgb2 = jt.decode(enc).to_rgb8()
    assert rgb2.shape == lake_rgb.shape
    assert _psnr(rgb2, lake_rgb) > 30.0


def test_pil_cross_validation(lake_rgb):
    """Streams must decode identically in an independent decoder."""
    from PIL import Image

    enc = encode_rgb(lake_rgb, 75)
    ours = jt.decode(enc).to_rgb8()
    pil = np.asarray(Image.open(io.BytesIO(enc)).convert("RGB"))
    # Different IDCT/upsampling implementations: allow small deviation
    assert _psnr(ours, pil) > 40.0


def test_optimize_coding_smaller(lake_rgb):
    fixed = encode_rgb(lake_rgb, 75, optimize_coding=False)
    optimized = encode_rgb(lake_rgb, 75, optimize_coding=True)
    assert len(optimized) < len(fixed)
    # both decode to the identical pixels (same coefficients)
    np.testing.assert_array_equal(
        jt.decode(fixed).to_uint16_extended(), jt.decode(optimized).to_uint16_extended()
    )


@pytest.mark.parametrize("ri", [4, 64])
def test_restart_interval_emission(lake_rgb, ri):
    """restart_interval emits DRI + cycling RSTn; output decodes
    identically via the restart-parallel native scanner, the sequential
    Python scanner, and an external decoder — and pixel-identical to
    the restart-free stream (restarts are lossless structure)."""
    import io as _io

    from PIL import Image

    import jpeglibrary_tpu as jt

    plain = encode_rgb(lake_rgb, 75)
    enc = encode_rgb(lake_rgb, 75, restart_interval=ri)
    assert b"\xff\xdd" in enc
    assert any(enc[i] == 0xFF and 0xD0 <= enc[i + 1] <= 0xD7 for i in range(len(enc) - 1))

    rn = jt.decode(enc, use_native=True).to_uint16_extended()
    rp = jt.decode(enc, use_native=False).to_uint16_extended()
    np.testing.assert_array_equal(rn, rp)
    np.testing.assert_array_equal(rn, jt.decode(plain).to_uint16_extended())

    pil = np.asarray(Image.open(_io.BytesIO(enc)).convert("RGB"))
    ours = jt.decode(enc).to_rgb8()
    assert _psnr(pil, ours) > 40


def test_gray_roundtrip(assets_dir):
    data = (assets_dir / "baseline/cramps.jpg").read_bytes()
    gray = jt.decode(data).to_uint8()[..., 0]
    enc = encode_gray(gray, 90, optimize_coding=True)
    out = jt.decode(enc).to_uint8()[..., 0]
    assert _psnr(out, gray) > 45.0


def test_quality_scaling_monotonic(lake_rgb):
    sizes = [len(encode_rgb(lake_rgb, q)) for q in (25, 50, 75, 95)]
    assert sizes == sorted(sizes)


def test_package_merge_optimal():
    rng = np.random.default_rng(7)
    for _ in range(10):
        freqs = np.zeros(256, dtype=np.int64)
        n = int(rng.integers(2, 200))
        idx = rng.choice(256, n, replace=False)
        freqs[idx] = rng.zipf(1.5, n)
        std = _standard_lengths(freqs)
        pm = _package_merge_lengths(freqs)
        cost_std = sum(int(freqs[s]) * l for s, l in std.items())
        cost_pm = sum(int(freqs[s]) * l for s, l in pm.items())
        assert cost_pm <= cost_std
        assert max(pm.values()) <= 16
        assert sum(2.0 ** -l for l in pm.values()) < 1.0  # all-ones reserved


def test_jax_encode_matches_numpy(lake_rgb):
    """The jitted device transform (one XLA program for pad + subsample
    + FDCT + quantize) matches the host path at the COEFFICIENT level:
    every quantized coefficient within 1 LSB (the butterfly vs GEMM
    float32 summation-order difference straddling a rounding boundary),
    and the overwhelming majority exactly equal."""
    import jax.numpy as jnp

    a = encode_rgb(lake_rgb[:128, :128], 75)
    b = encode_rgb(lake_rgb[:128, :128], 75, xp=jnp)
    ra = jt.decode(a)
    rb = jt.decode(b)
    total = 0
    diff = 0
    for k in ra.coefficients:
        ca = ra.coefficients[k].astype(np.int32)
        cb = rb.coefficients[k].astype(np.int32)
        d = np.abs(ca - cb)
        assert d.max() <= 1, f"component {k}: coefficient delta {d.max()} > 1 LSB"
        total += d.size
        diff += int((d > 0).sum())
    assert diff / total < 5e-3  # rare rounding-boundary flips only


@pytest.mark.parametrize("ri", [1, 16])
def test_optimize_coding_with_restarts(lake_rgb, ri):
    """Optimize-coding histograms must account for restart-boundary DC
    predictor resets: the segment-start DC diff is the raw DC value, a
    category that can be absent from the unbroken-chain histogram (at
    q85/ri16 on lake it is, and emission would raise 'no code for
    symbol'). The gather applies apply_restart_dc_fixup."""
    data = encode_rgb(lake_rgb, 85, optimize_coding=True, restart_interval=ri)
    plain = encode_rgb(lake_rgb, 85, optimize_coding=True)
    np.testing.assert_array_equal(
        jt.decode(data).to_uint16_extended(), jt.decode(plain).to_uint16_extended()
    )


# --- direct 12-bit sample encode (beyond the reference: its encoder is
# 8-bit only, JpegEncoder.cs:108 rejects 16-bit quant tables and the
# sample pipeline is byte-typed) ---


def _encode12(planes, quant_elements, *, sampling=None):
    from jpeglibrary_tpu.models.encoder import JpegEncoder
    from jpeglibrary_tpu.syntax.quantization import QuantizationTable

    enc = JpegEncoder()
    enc.sample_precision = 12
    precision = 1 if quant_elements.max() > 255 else 0
    enc.set_quantization_table(
        QuantizationTable(precision, 0, quant_elements.astype(np.uint16))
    )
    enc.set_huffman_table(True, 0, None)  # builders -> optimize coding
    enc.set_huffman_table(False, 0, None)
    sampling = sampling or [(1, 1)] * len(planes)
    for i, (h, v) in enumerate(sampling):
        enc.add_component(i + 1, 0, 0, 0, h, v)
    enc.set_input(planes)
    return enc.encode()


def _psnr12(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(4095.0**2 / mse) if mse else float("inf")


def test_direct_12bit_sample_encode_roundtrip():
    rng = np.random.default_rng(5)
    h, w = 96, 120
    grad = np.linspace(0, 4095, w)[None, :] + np.linspace(0, 500, h)[:, None]
    y = np.clip(grad + rng.integers(-40, 40, size=(h, w)), 0, 4095).astype(np.uint16)
    data = _encode12([y], np.full(64, 4, dtype=np.uint16))
    r = jt.decode(data)
    from jpeglibrary_tpu.syntax.markers import Marker

    assert r.frame.marker == Marker.SOF1  # extended sequential
    assert r.precision == 12
    assert _psnr12(r.planes[0], y) > 60


def test_direct_12bit_16bit_quant_table():
    """Quant values > 255 force 16-bit DQT elements (Pq=1) — legal for
    12-bit frames; decode must reproduce them exactly."""
    rng = np.random.default_rng(6)
    y = rng.integers(0, 4096, size=(64, 64), dtype=np.uint16)
    q = np.full(64, 300, dtype=np.uint16)
    q[0] = 1
    data = _encode12([y], q)
    r = jt.decode(data)
    assert r.precision == 12
    np.testing.assert_array_equal(r.quant[0], q)


def test_direct_12bit_vs_testorig12_semantics(assets_dir):
    """Re-encode the decoded samples of the committed 12-bit asset
    (testorig12.jpg, MetadataIdentifyTests.cs:46-57) through the direct
    12-bit sample path with 2x1 subsampling like the original; the
    re-decode must hold high PSNR against the source samples."""
    src = jt.decode(
        (assets_dir / "huffman_sequential/testorig12.jpg").read_bytes()
    )
    assert src.precision == 12
    planes = [src.planes[c.component_index] for c in src.geometry.components]
    # encoder input: full-resolution planes per component (box filter
    # re-subsamples); upsample the stored chroma to frame resolution
    H, W = src.height, src.width
    full = []
    for p in planes:
        p = np.asarray(p)
        if p.shape != (H, W):
            p = np.repeat(np.repeat(p, 2, axis=0), 2, axis=1)[:H, :W]
        full.append(np.clip(p, 0, 4095).astype(np.uint16))
    sampling = [
        (c.h, c.v)
        for c in src.geometry.components
    ]
    data = _encode12(full, np.full(64, 2, dtype=np.uint16), sampling=sampling)
    r = jt.decode(data)
    assert r.precision == 12 and (r.width, r.height) == (W, H)
    # evaluate over the even-aligned interior: the odd last row/column
    # (227x149) box-filters against the zero grid padding, matching the
    # reference's zero-filling block reader (JpegBufferInputReader.cs:27-51)
    He, We = (H // 2) * 2, (W // 2) * 2
    for c in r.geometry.components:
        got = np.asarray(r.planes[c.component_index])[:He, :We]
        ref = full[c.component_index][:He, :We]
        assert _psnr12(got, ref) > 40, c.component_index


@pytest.mark.parametrize("subsampling", ["422", "440", "411"])
def test_roundtrip_psnr_extended_subsamplings(lake_rgb, subsampling):
    """The libjpeg-standard ratios beyond the reference app's 4:2:0
    (EncodeAction.cs:54-56): luma (2,1)/(1,2)/(4,1), chroma 1x1."""
    from PIL import Image

    enc = encode_rgb(lake_rgb, 75, subsampling=subsampling)
    rgb2 = jt.decode(enc).to_rgb8()
    assert rgb2.shape == lake_rgb.shape
    assert _psnr(rgb2, lake_rgb) > 30.0
    pil = np.asarray(Image.open(io.BytesIO(enc)).convert("RGB"))
    assert _psnr(rgb2, pil) > 35.0


@pytest.mark.parametrize("hv", [(3, 1), (1, 3), (3, 2), (3, 3), (4, 4)])
def test_exotic_luma_sampling_roundtrip(hv):
    """Arbitrary T.81 sampling factors (incl. 3x, which libjpeg cannot
    decode) must round-trip through our own encoder+decoder. Dimensions
    are multiples of 8*h/8*v so chroma edge fill (zero-pad, reference
    JpegBufferInputReader.cs:36-39 semantics) does not enter."""
    from jpeglibrary_tpu.models.encoder import JpegEncoder
    from jpeglibrary_tpu.syntax import huffman_standard
    from jpeglibrary_tpu.syntax.quantization import (
        scale_by_quality,
        standard_chrominance_table,
        standard_luminance_table,
    )

    h, v = hv
    height, width = 8 * v * 3, 8 * h * 3
    yy = (
        np.linspace(30, 220, width)[None, :] + np.linspace(0, 30, height)[:, None]
    ).astype(np.uint8)
    ycc = np.stack(
        [yy, np.full_like(yy, 120), np.full_like(yy, 136)], axis=-1
    )
    enc = JpegEncoder()
    enc.set_quantization_table(scale_by_quality(standard_luminance_table(0), 95))
    enc.set_quantization_table(scale_by_quality(standard_chrominance_table(1), 95))
    enc.set_huffman_table(True, 0, huffman_standard.dc_luminance())
    enc.set_huffman_table(False, 0, huffman_standard.ac_luminance())
    enc.set_huffman_table(True, 1, huffman_standard.dc_chrominance())
    enc.set_huffman_table(False, 1, huffman_standard.ac_chrominance())
    enc.add_component(1, 0, 0, 0, h, v)
    enc.add_component(2, 1, 1, 1, 1, 1)
    enc.add_component(3, 1, 1, 1, 1, 1)
    enc.set_input(ycc)
    out = jt.decode(enc.encode()).to_uint8()
    assert np.abs(out[..., 0].astype(int) - yy.astype(int)).max() <= 4
    assert np.abs(out[..., 1].astype(int) - 120).max() <= 4
    assert np.abs(out[..., 2].astype(int) - 136).max() <= 4


def test_five_component_frame_roundtrip():
    """T.81 allows up to 255 components per frame (<=4 per scan); the
    encoder must split scans and the decoder must reassemble planes."""
    from jpeglibrary_tpu.models.encoder import JpegEncoder
    from jpeglibrary_tpu.syntax import huffman_standard
    from jpeglibrary_tpu.syntax.quantization import (
        scale_by_quality,
        standard_luminance_table,
    )

    rng = np.random.default_rng(3)
    planes = [
        np.clip(
            np.linspace(10 + 20 * i, 200, 56)[None, :] + rng.normal(0, 8, (40, 56)),
            0,
            255,
        ).astype(np.uint8)
        for i in range(5)
    ]
    enc = JpegEncoder()
    enc.set_quantization_table(scale_by_quality(standard_luminance_table(0), 92))
    enc.set_huffman_table(True, 0, huffman_standard.dc_luminance())
    enc.set_huffman_table(False, 0, huffman_standard.ac_luminance())
    for i in range(5):
        enc.add_component(i + 1, 0, 0, 0, 1, 1)
    enc.set_input(planes)
    out = jt.decode(enc.encode()).to_uint8()
    assert out.shape == (40, 56, 5)
    for i in range(5):
        assert np.abs(out[..., i].astype(int) - planes[i].astype(int)).max() <= 24


def test_gray_arithmetic_roundtrip():
    """encode_gray carries the same arithmetic/restart knobs as
    encode_rgb (SOF9 single-component)."""
    from jpeglibrary_tpu.models.encoder import encode_gray
    from jpeglibrary_tpu.syntax.markers import Marker

    rng = np.random.default_rng(5)
    img = np.clip(
        np.linspace(0, 255, 80)[None, :] + rng.normal(0, 15, (64, 80)), 0, 255
    ).astype(np.uint8)
    d = encode_gray(img, 80, arithmetic=True, restart_interval=3)
    res = jt.decode(d)
    assert res.frame.marker == Marker.SOF9
    assert np.abs(res.to_uint8()[..., 0].astype(int) - img.astype(int)).max() <= 30


def test_cmyk_encode_with_app14():
    """add_marker_segment emits APPn after SOI: a 4-component encode
    tagged with the Adobe APP14 transform is recognized as CMYK by our
    decoder AND by PIL/libjpeg (the reference encoder cannot write
    marker segments). Adobe stores CMYK inverted; to_cmyk8 un-inverts."""
    from PIL import Image

    from jpeglibrary_tpu.models.encoder import JpegEncoder
    from jpeglibrary_tpu.syntax import huffman_standard
    from jpeglibrary_tpu.syntax.quantization import (
        scale_by_quality,
        standard_luminance_table,
    )

    rng = np.random.default_rng(11)
    ink = np.clip(rng.normal(128, 40, (40, 48, 4)), 0, 255).astype(np.uint8)
    enc = JpegEncoder()
    enc.add_marker_segment(0xEE, b"Adobe" + bytes([0, 100, 0, 0, 0, 0, 0]))
    enc.set_quantization_table(scale_by_quality(standard_luminance_table(0), 92))
    enc.set_huffman_table(True, 0, huffman_standard.dc_luminance())
    enc.set_huffman_table(False, 0, huffman_standard.ac_luminance())
    for i in range(4):
        enc.add_component(i + 1, 0, 0, 0, 1, 1)
    enc.set_input(255 - ink)  # Adobe inverted storage
    data = enc.encode()

    res = jt.decode(data)
    assert res.color_transform == "cmyk"
    out = res.to_cmyk8()
    assert np.abs(out.astype(int) - ink.astype(int)).max() <= 24
    pil = Image.open(io.BytesIO(data))
    assert pil.mode == "CMYK"
    assert np.abs(out.astype(int) - np.asarray(pil).astype(int)).max() <= 1


def test_add_marker_segment_rejects_non_app():
    from jpeglibrary_tpu.models.encoder import JpegEncodeError, JpegEncoder

    enc = JpegEncoder()
    with pytest.raises(JpegEncodeError):
        enc.add_marker_segment(0xC0, b"x")  # SOF0 is not an APPn/COM
