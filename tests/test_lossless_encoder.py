"""Lossless (SOF3) encoder — a capability beyond the reference (its
encoder is baseline-only): round-trips must be bit-exact through our
reference-parity SOF3 decoder for every predictor, component count and
precision, including the t==16 (+-32768 wrap) special case."""

import numpy as np
import pytest

import jpeglibrary_tpu as jt
from jpeglibrary_tpu.models.lossless import encode_lossless


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(42)


@pytest.mark.parametrize("predictor", list(range(1, 8)))
def test_roundtrip_all_predictors(rng, predictor):
    img = rng.integers(0, 256, size=(48, 72), dtype=np.uint8)
    enc = encode_lossless(img, predictor=predictor)
    rec = jt.decode(enc).planes[0].astype(np.uint8)[:48, :72]
    np.testing.assert_array_equal(rec, img)


def test_roundtrip_rgb(rng):
    img = rng.integers(0, 256, size=(33, 47, 3), dtype=np.uint8)
    enc = encode_lossless(img, predictor=4)
    r = jt.decode(enc)
    rec = np.stack([r.planes[i] for i in range(3)], axis=-1).astype(np.uint8)
    np.testing.assert_array_equal(rec[:33, :47], img)


def test_roundtrip_16bit_wraparound(rng):
    """Random 16-bit samples exercise the t==16 -> 32768 category and
    int16 wraparound storage."""
    img = rng.integers(0, 65536, size=(24, 24), dtype=np.uint16)
    enc = encode_lossless(img, precision=16, predictor=1)
    rec = jt.decode(enc).planes[0].astype(np.int64) & 0xFFFF
    np.testing.assert_array_equal(rec[:24, :24], img.astype(np.int64))


def test_point_transform(rng):
    img = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    enc = encode_lossless(img, predictor=1, point_transform=2)
    rec = jt.decode(enc).planes[0]
    # decoder output is the point-transformed samples scaled back up by
    # the output stage? No — planes hold raw Pt-shifted samples.
    np.testing.assert_array_equal(
        rec[:16, :16].astype(np.int64), (img >> 2).astype(np.int64)
    )


@pytest.mark.parametrize("predictor", [1, 4, 7])
@pytest.mark.parametrize("ri", [1, 7, 64])
def test_restart_interval_roundtrip(rng, predictor, ri):
    """DRI/RSTn lossless streams: parallel restart decode, sequential
    native decode and the pure-Python scanner must all agree, and the
    round trip must be exact."""
    import os

    img = rng.integers(0, 256, size=(21, 33, 3), dtype=np.uint8)
    enc = encode_lossless(img, predictor=predictor, restart_interval=ri)
    os.environ["JPX_SCAN_THREADS"] = "4"
    try:
        a = jt.decode(enc)
        b = jt.decode(enc, use_native=False)
    finally:
        os.environ.pop("JPX_SCAN_THREADS", None)
    for k in a.samples:
        np.testing.assert_array_equal(a.samples[k], b.samples[k])
    rec = np.stack([a.planes[i] for i in range(3)], axis=-1).astype(np.uint8)
    np.testing.assert_array_equal(rec[:21, :33], img)


def test_speculative_single_component(rng):
    """Grayscale single-span streams decode through the speculative
    self-sync parallel path — bit-identical to sequential."""
    import os

    img = rng.integers(0, 256, size=(512, 640), dtype=np.uint8)
    enc = encode_lossless(img, predictor=1)
    os.environ["JPX_SCAN_THREADS"] = "4"
    try:
        a = jt.decode(enc)
    finally:
        os.environ.pop("JPX_SCAN_THREADS", None)
    os.environ["JPX_SCAN_THREADS"] = "1"
    try:
        b = jt.decode(enc)
    finally:
        os.environ.pop("JPX_SCAN_THREADS", None)
    np.testing.assert_array_equal(a.samples[0], b.samples[0])


def test_native_and_python_packers_agree(rng):
    from jpeglibrary_tpu.models.lossless import _pack_lossless_py
    from jpeglibrary_tpu.models.huffman_builder import HuffmanTableBuilder

    try:
        from jpeglibrary_tpu.native import scanner as native_scanner

        native_scanner.build.load_library()
    except ImportError:
        pytest.skip("native scanner unavailable")

    cats = rng.integers(0, 12, size=512).astype(np.uint8)
    raws = rng.integers(0, 65536, size=512).astype(np.uint16)
    freq = np.bincount(cats, minlength=256).astype(np.int64)
    b = HuffmanTableBuilder()
    b.add_frequencies(freq)
    table = b.build(optimal=True)
    a = native_scanner.pack_lossless(cats, raws, [table])
    c = _pack_lossless_py(cats, raws, [table], np.array([0], dtype=np.uint8))
    assert a == c


def test_python_decoder_agrees_on_generated_stream(rng):
    """The generated stream decodes identically through the native and
    pure-Python scanners — extra lossless coverage from fresh data."""
    img = rng.integers(0, 256, size=(24, 40), dtype=np.uint8)
    enc = encode_lossless(img, predictor=6)
    a = jt.decode(enc, use_native=True)
    b = jt.decode(enc, use_native=False)
    np.testing.assert_array_equal(a.samples[0], b.samples[0])


def test_transcode_preserves_point_transform():
    """A Pt>0 lossless input must transcode to a Pt-declaring stream
    whose decoded (Pt-domain) samples match the input's exactly — a
    conformant third-party decoder renders sample<<Pt either way."""
    import jpeglibrary_tpu as jt
    from jpeglibrary_tpu.models.lossless import encode_lossless
    from jpeglibrary_tpu.syntax.frame import ScanHeader
    from jpeglibrary_tpu.io.reader import parse_stream
    from jpeglibrary_tpu.syntax.markers import Marker

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (40, 44)).astype(np.int32)
    src = encode_lossless(img, predictor=3, point_transform=2)
    out = jt.transcode(src, "optimal")
    sos = next(
        s for s in parse_stream(out).segments if s.marker == Marker.SOS
    )
    assert ScanHeader.parse(sos.payload(out)).successive_approximation_bit_position_low == 2
    a, b = jt.decode(src), jt.decode(out)
    assert np.array_equal(a.planes[0], b.planes[0])
    # arithmetic target too
    out11 = jt.transcode(src, "arithmetic")
    sos11 = next(
        s for s in parse_stream(out11).segments if s.marker == Marker.SOS
    )
    assert ScanHeader.parse(sos11.payload(out11)).successive_approximation_bit_position_low == 2
    assert np.array_equal(a.planes[0], jt.decode(out11).planes[0])


@pytest.mark.parametrize("predictor", [1, 2, 3, 4, 5, 6, 7])
@pytest.mark.parametrize("ri", [32, 33, 34, 69, 100000])
def test_restart_reconstruction_alignment(rng, predictor, ri):
    """Restart boundaries at every row alignment (ri == width, width+-1,
    2*width+3, and past-the-end) through the run-splitting parallel
    reconstruction, for all 7 predictors, vs the pure-Python scanner."""
    import os

    img = rng.integers(0, 256, size=(17, 33, 3), dtype=np.uint8)
    enc = encode_lossless(img, predictor=predictor, restart_interval=ri)
    os.environ["JPX_SCAN_THREADS"] = "4"
    try:
        a = jt.decode(enc)
        b = jt.decode(enc, use_native=False)
    finally:
        os.environ.pop("JPX_SCAN_THREADS", None)
    for k in a.samples:
        np.testing.assert_array_equal(a.samples[k], b.samples[k])
    rec = np.stack([a.planes[i] for i in range(3)], axis=-1).astype(np.uint8)
    np.testing.assert_array_equal(rec[:17, :33], img)
