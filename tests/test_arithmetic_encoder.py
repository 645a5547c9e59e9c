"""Arithmetic (SOF9) encoder — a capability beyond the reference
(JpegEncoder.cs is Huffman-only): the native QM coder must round-trip
bit-exactly through the reference-parity arithmetic decoder (native AND
pure Python), with and without restart intervals."""

import numpy as np
import pytest

import jpeglibrary_tpu as jt


@pytest.fixture(scope="module")
def native_lib():
    from jpeglibrary_tpu.native import build

    try:
        return build.load_library()
    except ImportError as exc:
        pytest.skip(f"native scanner unavailable: {exc}")


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(77)


def _coefficients_match(a, b):
    for k in a.coefficients:
        np.testing.assert_array_equal(a.coefficients[k], b.coefficients[k])


@pytest.mark.parametrize("quality", [50, 75, 95])
def test_roundtrip_matches_huffman_coefficients(native_lib, rng, quality):
    img = rng.integers(0, 256, size=(56, 72, 3), dtype=np.uint8)
    huff = jt.decode(jt.encode_rgb(img, quality))
    arith = jt.decode(jt.encode_rgb(img, quality, arithmetic=True))
    _coefficients_match(huff, arith)


def test_python_decoder_agrees(native_lib, rng):
    img = rng.integers(0, 256, size=(40, 40, 3), dtype=np.uint8)
    data = jt.encode_rgb(img, 75, arithmetic=True)
    _coefficients_match(jt.decode(data), jt.decode(data, use_native=False))


@pytest.mark.parametrize("ri", [1, 3, 17])
def test_restart_intervals(native_lib, rng, ri):
    img = rng.integers(0, 256, size=(48, 64, 3), dtype=np.uint8)
    ref = jt.decode(jt.encode_rgb(img, 75))
    data = jt.encode_rgb(img, 75, arithmetic=True, restart_interval=ri)
    dec = jt.decode(data)
    _coefficients_match(ref, dec)
    _coefficients_match(dec, jt.decode(data, use_native=False))


def test_arithmetic_smaller_than_huffman(native_lib, assets_dir):
    """The adaptive coder should beat fixed Huffman tables on a real
    photo (the reason SOF9 exists)."""
    rgb = jt.decode((assets_dir / "baseline/lake.jpg").read_bytes()).to_rgb8()
    h = jt.encode_rgb(rgb, 75)
    a = jt.encode_rgb(rgb, 75, arithmetic=True)
    assert len(a) < len(h)
    _coefficients_match(jt.decode(h), jt.decode(a))


def test_carry_and_stuffing_paths(native_lib, rng):
    """Many small high-entropy images to exercise byte-out carry
    propagation, 0xFF stacking and stuffing."""
    for i in range(20):
        img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
        data = jt.encode_rgb(img, 95, arithmetic=True)
        huff = jt.decode(jt.encode_rgb(img, 95))
        _coefficients_match(huff, jt.decode(data))
