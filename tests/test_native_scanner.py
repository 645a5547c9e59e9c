"""Native C++ scanner parity: bit-identical coefficients/samples vs the
pure-Python reference scanners across every entropy-coding mode."""

import numpy as np
import pytest

import jpeglibrary_tpu as jt

CASES = [
    "baseline/cramps.jpg",
    "baseline/lake.jpg",
    "baseline/HETissueSlide.jpg",
    "huffman_sequential/testorig12.jpg",
    "huffman_progressive/progress.jpg",
    "huffman_progressive/yellowcat_progressive_restart.jpg",
    "huffman_lossless/lossless1_s22.jpg",
    "huffman_lossless/lossless7_s22.jpg",
    "arithmetic_sequential/zackthecat_arith.jpg",
    "arithmetic_sequential/yellowcat_arith_restart.jpg",
    "arithmetic_progressive/yellowcat_progressive_arith.jpg",
    "arithmetic_progressive/yellowcat_progressive_arith_restart.jpg",
]


@pytest.fixture(scope="module")
def native_lib():
    from jpeglibrary_tpu.native import build

    try:
        return build.load_library()
    except ImportError as exc:
        pytest.skip(f"native scanner unavailable: {exc}")


@pytest.mark.parametrize("rel", CASES, ids=CASES)
def test_native_matches_python(assets_dir, native_lib, rel):
    data = (assets_dir / rel).read_bytes()
    r_native = jt.decode(data, use_native=True)
    r_py = jt.decode(data, use_native=False)
    if r_native.coefficients is not None:
        assert set(r_native.coefficients) == set(r_py.coefficients)
        for k in r_native.coefficients:
            np.testing.assert_array_equal(
                r_native.coefficients[k], r_py.coefficients[k]
            )
    else:  # lossless: sample planes
        for k in r_native.samples:
            np.testing.assert_array_equal(r_native.samples[k], r_py.samples[k])


def test_native_baseline_restart_parallel(native_lib):
    """No committed baseline asset uses restart markers, so generate one
    (PIL emits DRI + RSTn) and assert the threaded restart-parallel
    native path matches the sequential Python scanner bit-for-bit, and
    an independent decoder agrees on the pixels."""
    import io

    from PIL import Image

    # smooth gradient: keeps the PIL comparison meaningful (PIL uses
    # fancy chroma upsampling; we match the reference's duplication)
    yy, xx = np.mgrid[0:128, 0:160]
    rgb = np.stack([(yy * 2) % 256, (xx * 3) % 256, ((yy + xx)) % 256], -1).astype(np.uint8)
    img = Image.fromarray(rgb, "RGB")
    buf = io.BytesIO()
    img.save(buf, "JPEG", quality=80, restart_marker_rows=2)
    data = buf.getvalue()
    assert b"\xff\xdd" in data  # DRI present

    r_native = jt.decode(data, use_native=True)
    r_py = jt.decode(data, use_native=False)
    for k in r_native.coefficients:
        np.testing.assert_array_equal(r_native.coefficients[k], r_py.coefficients[k])

    pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    ours = r_native.to_rgb8()
    mse = np.mean((pil.astype(np.float64) - ours.astype(np.float64)) ** 2)
    assert 10 * np.log10(255.0**2 / max(mse, 1e-9)) > 30


@pytest.mark.parametrize(
    "rel", ["baseline/cramps.jpg", "baseline/lake.jpg", "baseline/HETissueSlide.jpg"]
)
def test_speculative_parallel_decode_parity(assets_dir, native_lib, monkeypatch, rel):
    """The speculative self-sync parallel path (no restart markers)
    must be bit-identical to the sequential Python scanner."""
    monkeypatch.setenv("JPX_SCAN_THREADS", "4")
    monkeypatch.setenv("JPX_SPECULATIVE", "1")
    data = (assets_dir / rel).read_bytes()
    r_native = jt.decode(data, use_native=True)
    r_py = jt.decode(data, use_native=False)
    for k in r_native.coefficients:
        np.testing.assert_array_equal(r_native.coefficients[k], r_py.coefficients[k])


def test_speculative_fuzz_own_encodes(assets_dir, native_lib, monkeypatch):
    """Speculative decode across quality levels of restart-free streams
    our encoder produced."""
    monkeypatch.setenv("JPX_SCAN_THREADS", "4")
    rgb = jt.decode((assets_dir / "baseline/lake.jpg").read_bytes()).to_rgb8()
    from jpeglibrary_tpu.models.encoder import encode_rgb

    for q in (30, 60, 90):
        enc = encode_rgb(rgb, q)
        a = jt.decode(enc, use_native=True)
        b = jt.decode(enc, use_native=False)
        for k in a.coefficients:
            np.testing.assert_array_equal(a.coefficients[k], b.coefficients[k])


def test_native_rgb_to_ycbcr_parity(native_lib):
    """Native fixed-point color conversion is bit-identical to the
    numpy reference (JpegRgbToYCbCrConverter parity)."""
    from jpeglibrary_tpu.native import scanner as ns
    from jpeglibrary_tpu.ops import color

    rng = np.random.default_rng(11)
    rgb = rng.integers(0, 256, size=(257, 123, 3), dtype=np.uint8)
    y1, cb1, cr1 = ns.rgb_to_ycbcr(rgb)
    y2, cb2, cr2 = color.rgb_to_ycbcr(rgb[..., 0], rgb[..., 1], rgb[..., 2])
    np.testing.assert_array_equal(y1, y2)
    np.testing.assert_array_equal(cb1, cb2)
    np.testing.assert_array_equal(cr1, cr2)


def test_native_single_thread_matches(assets_dir, native_lib, monkeypatch):
    monkeypatch.setenv("JPX_SCAN_THREADS", "1")
    data = (assets_dir / "baseline/HETissueSlide.jpg").read_bytes()
    r1 = jt.decode(data, use_native=True)
    monkeypatch.setenv("JPX_SCAN_THREADS", "8")
    r8 = jt.decode(data, use_native=True)
    for k in r1.coefficients:
        np.testing.assert_array_equal(r1.coefficients[k], r8.coefficients[k])
