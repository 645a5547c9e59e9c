"""Progressive (SOF2) encoder — beyond-reference capability: full
spectral-selection + successive-approximation scripts must round-trip
coefficient-exact against the baseline encode of the same samples,
through both the native and pure-Python decoders."""

import numpy as np
import pytest

import jpeglibrary_tpu as jt
from jpeglibrary_tpu.models.progressive_encoder import (
    encode_progressive_gray,
    encode_progressive_rgb,
)


@pytest.fixture(scope="module")
def native_lib():
    from jpeglibrary_tpu.native import build

    try:
        return build.load_library()
    except ImportError as exc:
        pytest.skip(f"native scanner unavailable: {exc}")


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(21)


def _match(a, b):
    for k in a.coefficients:
        np.testing.assert_array_equal(a.coefficients[k], b.coefficients[k])


@pytest.mark.parametrize("quality", [50, 75, 95])
def test_roundtrip_vs_baseline(native_lib, rng, quality):
    img = rng.integers(0, 256, size=(56, 72, 3), dtype=np.uint8)
    base = jt.decode(jt.encode_rgb(img, quality))
    prog = jt.decode(encode_progressive_rgb(img, quality))
    _match(base, prog)


def test_python_decoder_agrees(native_lib, rng):
    img = rng.integers(0, 256, size=(40, 48, 3), dtype=np.uint8)
    data = encode_progressive_rgb(img, 75)
    _match(jt.decode(data), jt.decode(data, use_native=False))


def test_real_image_and_sizes(native_lib, assets_dir):
    rgb = jt.decode((assets_dir / "baseline/lake.jpg").read_bytes()).to_rgb8()
    prog = encode_progressive_rgb(rgb, 75)
    base = jt.encode_rgb(rgb, 75)
    _match(jt.decode(base), jt.decode(prog))
    assert len(prog) < len(base)  # optimal tables + progressive ordering


def test_444_and_gray(native_lib, rng):
    img = rng.integers(0, 256, size=(41, 33, 3), dtype=np.uint8)
    _match(
        jt.decode(jt.encode_rgb(img, 80, subsampling="444")),
        jt.decode(encode_progressive_rgb(img, 80, subsampling="444")),
    )
    g = rng.integers(0, 256, size=(37, 29), dtype=np.uint8)
    data = encode_progressive_gray(g, 75)
    _match(jt.decode(data), jt.decode(data, use_native=False))


@pytest.mark.parametrize("quality", [50, 75, 95])
def test_arithmetic_progressive_roundtrip(native_lib, rng, quality):
    """SOF10: the QM coder driven by the progressive script must be
    coefficient-exact vs baseline, through both decoders."""
    img = rng.integers(0, 256, size=(48, 56, 3), dtype=np.uint8)
    base = jt.decode(jt.encode_rgb(img, quality))
    data = encode_progressive_rgb(img, quality, arithmetic=True)
    _match(base, jt.decode(data))
    _match(base, jt.decode(data, use_native=False))


def test_arithmetic_progressive_smallest(native_lib, assets_dir):
    rgb = jt.decode((assets_dir / "baseline/lake.jpg").read_bytes()).to_rgb8()
    sof10 = encode_progressive_rgb(rgb, 75, arithmetic=True)
    _match(jt.decode(jt.encode_rgb(rgb, 75)), jt.decode(sof10))
    assert len(sof10) < len(encode_progressive_rgb(rgb, 75))  # beats SOF2
    assert len(sof10) < len(jt.encode_rgb(rgb, 75, arithmetic=True))  # beats SOF9


@pytest.mark.parametrize("arithmetic", [False, True])
@pytest.mark.parametrize("ri", [1, 5, 37])
def test_restart_intervals(native_lib, rng, arithmetic, ri):
    """Restart seams through the whole scan script: every emitter state
    resets per segment; native and Python decoders agree and match the
    baseline coefficients exactly."""
    img = rng.integers(0, 256, size=(48, 64, 3), dtype=np.uint8)
    base = jt.decode(jt.encode_rgb(img, 75))
    data = encode_progressive_rgb(img, 75, arithmetic=arithmetic, restart_interval=ri)
    _match(base, jt.decode(data))
    _match(base, jt.decode(data, use_native=False))


def test_external_decoder_reads_restart_stream(native_lib, rng):
    import io

    from PIL import Image

    img = rng.integers(0, 256, size=(48, 64, 3), dtype=np.uint8)
    data = encode_progressive_rgb(img, 75, restart_interval=1)
    assert np.asarray(Image.open(io.BytesIO(data)).convert("RGB")).shape == (48, 64, 3)


def test_external_decoder_reads_it(native_lib, assets_dir):
    """libjpeg (via PIL) must accept our progressive stream — external
    conformance evidence."""
    import io

    from PIL import Image

    rgb = jt.decode((assets_dir / "baseline/lake.jpg").read_bytes()).to_rgb8()
    prog = encode_progressive_rgb(rgb, 75)
    pil = np.asarray(Image.open(io.BytesIO(prog)).convert("RGB"))
    ours = jt.decode(prog).to_rgb8()
    mse = np.mean((pil.astype(float) - ours.astype(float)) ** 2)
    assert 10 * np.log10(255**2 / max(mse, 1e-9)) > 40
