"""Parity of the fused native host RGB transform (jpx_decode_transform_rgb:
dequant + AAN IDCT + duplication upsample + fixed-point YCbCr->RGB in one
threaded pass) against the pure numpy pipeline it replaced — which is
itself fixture-validated bit-exact against the C# reference's goldens."""

import numpy as np
import pytest

import jpeglibrary_tpu as jt
from jpeglibrary_tpu.ops import color as color_ops
from jpeglibrary_tpu.ops import decode_stage


@pytest.fixture(scope="module")
def native_lib():
    from jpeglibrary_tpu.native import build

    try:
        return build.load_library()
    except ImportError as exc:
        pytest.skip(f"native scanner unavailable: {exc}")


def numpy_rgb(res):
    """The pre-existing numpy to_rgb8 pipeline, spelled out."""
    u8 = [
        decode_stage.normalize_to_uint8(res.planes[i], res.precision)
        for i in sorted(res.planes)
    ]
    if len(u8) == 1:
        half = np.full_like(u8[0], 128)
        r, g, b = color_ops.ycbcr_to_rgb(u8[0], half, half)
    elif res.color_transform == "rgb":
        r, g, b = u8
    else:
        r, g, b = color_ops.ycbcr_to_rgb(*u8)
    return np.stack([r, g, b], axis=-1)


FIXTURE_ASSETS = [
    "baseline/lake.jpg",
    "baseline/cramps.jpg",  # grayscale
    "baseline/HETissueSlide.jpg",
    # progressive / arithmetic variants of lake, synthesized in-test
    # with this framework's own encoders (no such committed assets):
    "synth:progressive",
    "synth:arithmetic",
]


@pytest.fixture(scope="module")
def synth_assets(assets_dir):
    """Progressive + arithmetic re-encodings of lake.jpg, produced by
    the repo's own encoders (round-3 review: don't skip on assets the
    framework can synthesize)."""
    from jpeglibrary_tpu.models.progressive_encoder import encode_progressive_rgb

    rgb = jt.decode((assets_dir / "baseline/lake.jpg").read_bytes()).to_rgb8()
    return {
        "synth:progressive": encode_progressive_rgb(rgb, 85),
        "synth:arithmetic": jt.encode_rgb(rgb, 85, arithmetic=True),
    }


@pytest.mark.parametrize("rel", FIXTURE_ASSETS)
def test_fixture_parity(native_lib, assets_dir, synth_assets, rel):
    if rel.startswith("synth:"):
        data = synth_assets[rel]
    else:
        path = assets_dir / rel
        if not path.exists():
            pytest.skip(f"missing asset {rel}")
        data = path.read_bytes()
    res = jt.decode(data)
    if res.precision != 8 or res.frame.number_of_components not in (1, 3):
        pytest.skip("native RGB path is 8-bit 1/3-component only")
    assert np.array_equal(res.to_rgb8(), numpy_rgb(res))


@pytest.mark.parametrize("sub", ["444", "422", "420", "440", "411"])
def test_subsampling_parity(native_lib, sub):
    rng = np.random.default_rng(5)
    rgb = np.clip(
        np.linspace(0, 255, 313)[None, :, None] + rng.normal(0, 30, (221, 313, 3)),
        0,
        255,
    ).astype(np.uint8)
    res = jt.decode(jt.encode_rgb(rgb, 85, subsampling=sub))
    assert np.array_equal(res.to_rgb8(), numpy_rgb(res))


def test_gray_parity(native_lib):
    rng = np.random.default_rng(6)
    g = rng.integers(0, 256, (123, 77), dtype=np.uint8)
    res = jt.decode(jt.encode_gray(g, 90))
    assert np.array_equal(res.to_rgb8(), numpy_rgb(res))


def test_rgb_coded_stream_parity(native_lib, assets_dir):
    # Adobe transform 0 (RGB-coded components): build one via PIL if
    # available, else via our own encoder's keep-RGB path if offered;
    # fall back to skipping.
    from PIL import Image
    import io

    rng = np.random.default_rng(7)
    rgb = rng.integers(0, 256, (64, 96, 3), dtype=np.uint8)
    buf = io.BytesIO()
    # PIL writes RGB-coded JPEGs (no subsampling, Adobe marker) for
    # keep_rgb-capable versions; otherwise skip.
    try:
        Image.fromarray(rgb).save(buf, "JPEG", quality=95, keep_rgb=True)
    except (TypeError, OSError):
        pytest.skip("PIL without keep_rgb support")
    res = jt.decode(buf.getvalue())
    if res.color_transform != "rgb":
        pytest.skip("stream did not come out RGB-coded")
    assert np.array_equal(res.to_rgb8(), numpy_rgb(res))


def test_odd_dimensions_parity(native_lib):
    rng = np.random.default_rng(8)
    for shape in [(8, 8), (9, 17), (16, 15), (1, 1), (7, 129)]:
        rgb = rng.integers(0, 256, shape + (3,), dtype=np.uint8)
        res = jt.decode(jt.encode_rgb(rgb, 75))
        assert np.array_equal(res.to_rgb8(), numpy_rgb(res)), shape


# ---------------------------------------------------------------------------
# Round-4: one-call fused decode_rgb8 (scan + transform, shared pool)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("interval", [0, 5, 64])
@pytest.mark.parametrize("sub", ["444", "420", "422"])
def test_decode_rgb8_fused_parity(native_lib, interval, sub):
    rng = np.random.default_rng(8)
    rgb = np.clip(
        np.linspace(0, 255, 313)[None, :, None] + rng.normal(0, 30, (221, 313, 3)),
        0,
        255,
    ).astype(np.uint8)
    data = jt.encode_rgb(rgb, 85, subsampling=sub, restart_interval=interval)
    assert np.array_equal(jt.decode_rgb8(data), jt.decode(data).to_rgb8())


def test_decode_rgb8_fused_gray_and_fallbacks(native_lib, assets_dir):
    rng = np.random.default_rng(9)
    g = rng.integers(0, 256, (123, 77), dtype=np.uint8)
    gdata = jt.encode_gray(g, 90, restart_interval=3)
    assert np.array_equal(jt.decode_rgb8(gdata), jt.decode(gdata).to_rgb8())
    # progressive input: falls back to the staged path, still exact
    from jpeglibrary_tpu.models.progressive_encoder import encode_progressive_rgb

    rgb = jt.decode((assets_dir / "baseline/lake.jpg").read_bytes()).to_rgb8()
    prog = encode_progressive_rgb(rgb[:128, :160], 85)
    assert np.array_equal(jt.decode_rgb8(prog), jt.decode(prog).to_rgb8())
    # fancy upsampling: staged path by design
    base = jt.encode_rgb(rgb[:128, :160], 85, restart_interval=4)
    assert np.array_equal(
        jt.decode_rgb8(base, upsample="fancy"),
        jt.decode(base).to_rgb8(upsample="fancy"),
    )


def test_decode_rgb8_fused_engages(native_lib, monkeypatch):
    from jpeglibrary_tpu.native import scanner as native_scanner

    calls = []
    real = native_scanner.decode_rgb_fused

    def spy(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(native_scanner, "decode_rgb_fused", spy)
    rng = np.random.default_rng(10)
    rgb = rng.integers(0, 256, (64, 96, 3), dtype=np.uint8)
    data = jt.encode_rgb(rgb, 85, restart_interval=2)
    out = jt.decode_rgb8(data)
    assert calls, "fused decode path did not engage"
    assert np.array_equal(out, jt.decode(data).to_rgb8())


def test_decode_rgb8_truncated_matches_strict(native_lib):
    # decode_rgb8 is the strict one-call path: a truncated stream must
    # raise exactly like decode(cut).to_rgb8() does (the tolerant
    # variant is decode(cut, tolerant=True)).
    rng = np.random.default_rng(12)
    rgb = np.clip(
        np.linspace(0, 255, 240)[None, :, None] + rng.normal(0, 25, (200, 240, 3)),
        0, 255,
    ).astype(np.uint8)
    data = jt.encode_rgb(rgb, 85, restart_interval=5)
    cut = data[: int(len(data) * 0.6)]
    with pytest.raises(Exception) as strict_err:
        jt.decode(cut).to_rgb8()
    with pytest.raises(Exception) as fused_err:
        jt.decode_rgb8(cut)
    assert type(fused_err.value) is type(strict_err.value)
