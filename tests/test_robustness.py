"""Malformed-input and API-surface tests.

The reference's failure-handling discipline (SURVEY.md §5): parsers
fail with offset-carrying errors, bit reads past EOF serve 1-padding
(leading to invalid-code errors rather than crashes), truncation at
restart boundaries is tolerated, unsupported SOFs raise. Plus the
abbreviated-stream (LoadTables) and Reset* API families.
"""

import numpy as np
import pytest

import jpeglibrary_tpu as jt
from jpeglibrary_tpu.io.reader import JpegStreamError
from jpeglibrary_tpu.models.decoder import JpegDecoder, JpegUnsupportedError
from jpeglibrary_tpu.models.huffman_baseline import JpegDecodeError
from jpeglibrary_tpu.syntax.huffman import JpegHuffmanError


def test_garbage_input():
    with pytest.raises(JpegStreamError, match="Marker SOI expected"):
        jt.decode(b"not a jpeg at all")


def test_empty_input():
    with pytest.raises(JpegStreamError):
        jt.decode(b"")


def test_truncated_segment(assets_dir):
    data = (assets_dir / "baseline/lake.jpg").read_bytes()
    # cut inside the SOF segment
    with pytest.raises(JpegStreamError):
        jt.decode(data[:200])


def test_truncated_entropy_stream(assets_dir):
    """Cutting mid-ECS: the 1-padded bit reader eventually decodes an
    invalid Huffman code (the reference's fuzz-resilient failure mode),
    on both the native and the Python scanner."""
    data = (assets_dir / "baseline/lake.jpg").read_bytes()
    cut = data[: len(data) // 2]
    for native in (True, False):
        with pytest.raises((JpegHuffmanError, JpegDecodeError, ValueError)):
            jt.decode(cut, use_native=native)


def test_unsupported_sof(assets_dir):
    """A differential SOF (0xC5) must raise the not-supported error."""
    data = bytearray((assets_dir / "baseline/lake.jpg").read_bytes())
    # find the SOF0 marker and rewrite to SOF5
    i = bytes(data).find(b"\xff\xc0")
    assert i > 0
    data[i + 1] = 0xC5
    with pytest.raises(JpegUnsupportedError, match="not supported"):
        jt.decode(bytes(data))


def test_missing_huffman_table(assets_dir):
    """Dropping the DHT segment must fail with a table-missing error."""
    data = (assets_dir / "baseline/cramps.jpg").read_bytes()
    from jpeglibrary_tpu.io import reader as io_reader
    from jpeglibrary_tpu.syntax.markers import Marker

    stream = io_reader.parse_stream(data)
    dht = next(s for s in stream.segments if s.marker == Marker.DHT)
    stripped = data[: dht.offset] + data[dht.payload_end :]
    with pytest.raises(JpegDecodeError, match="not defined"):
        jt.decode(stripped)


def test_load_tables_abbreviated_stream(assets_dir):
    """LoadTables parity (JpegDecoder.cs:313-405): feed tables from a
    tables-only stream, then decode an image whose own tables were
    stripped."""
    data = (assets_dir / "baseline/cramps.jpg").read_bytes()
    from jpeglibrary_tpu.io import reader as io_reader
    from jpeglibrary_tpu.syntax.markers import Marker

    stream = io_reader.parse_stream(data)
    # build a tables-only stream (DQT + DHT + DRI segments)
    tables = bytearray(b"\xff\xd8")  # SOI
    body = bytearray(data)
    for seg in reversed(stream.segments):
        if seg.marker in (Marker.DQT, Marker.DHT, Marker.DRI):
            tables_payload = data[seg.offset : seg.payload_end]
            tables += tables_payload
            del body[seg.offset : seg.payload_end]
    tables += b"\xff\xd9"  # EOI

    decoder = JpegDecoder()
    decoder.set_input(bytes(body))
    with pytest.raises(ValueError):
        decoder.decode()  # tables stripped -> must fail

    decoder2 = JpegDecoder()
    decoder2.load_tables(bytes(tables))
    decoder2.set_input(bytes(body))
    result = decoder2.decode()
    expected = jt.decode(data).to_uint16_extended()
    np.testing.assert_array_equal(result.to_uint16_extended(), expected)


def test_reset_family(assets_dir):
    decoder = JpegDecoder()
    decoder.set_input((assets_dir / "baseline/cramps.jpg").read_bytes())
    decoder.identify(load_quantization_tables=True)
    assert decoder.estimate_quality() is not None
    decoder.reset_quantization_tables()
    assert decoder.estimate_quality() is None
    decoder.reset()
    assert decoder.get_restart_interval() == 0


def test_decode_twice_same_result(assets_dir):
    """Decoder instances are reusable (the reference's Reset contract)."""
    data = (assets_dir / "baseline/cramps.jpg").read_bytes()
    decoder = JpegDecoder()
    decoder.set_input(data)
    a = decoder.decode().to_uint16_extended()
    decoder.reset()
    decoder.set_input(data)
    b = decoder.decode().to_uint16_extended()
    np.testing.assert_array_equal(a, b)


def test_missing_restart_marker_mid_scan_raises(assets_dir):
    """A non-restart marker at a restart boundary MID-scan is a corrupt
    stream and must raise (reference HandleRestart throws). Only a
    boundary that coincides with the true scan end is tolerated (libjpeg
    convention; our own restart-emitting encoders produce such streams)."""
    from jpeglibrary_tpu.models.encoder import encode_rgb

    rng = np.random.default_rng(3)
    rgb = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    data = encode_rgb(rgb, 75, restart_interval=2)
    # Replace the FIRST restart marker (0xFFD0) with a DHT marker +
    # empty-ish payload so the span terminator is a non-restart marker
    # while many MCUs remain.
    idx = data.find(b"\xff\xd0")
    assert idx > 0
    corrupt = data[:idx] + b"\xff\xfe\x00\x04ab" + data[idx + 2 :]
    decoder = JpegDecoder()
    decoder.set_input(corrupt)
    with pytest.raises((JpegDecodeError, JpegStreamError)):
        decoder.decode()


def test_decoder_reuse_resets_stream_state():
    """set_input must clear the previous image's DRI (and Adobe tag):
    the reference SetInput zeroes _restartInterval (JpegDecoder.cs:61).
    A stale interval would silently truncate the next image's single
    entropy span to one restart interval of MCUs."""
    import jpeglibrary_tpu as jt

    rng = np.random.default_rng(3)
    img = np.clip(
        np.linspace(0, 255, 64)[None, :, None] + rng.normal(0, 10, (64, 64, 3)),
        0, 255,
    ).astype(np.uint8)
    with_dri = jt.encode_rgb(img, 80, restart_interval=4)
    without = jt.encode_rgb(img, 80)
    dec = jt.JpegDecoder()
    dec.set_input(with_dri)
    first = dec.decode().to_rgb8()
    dec.set_input(without)
    second = dec.decode().to_rgb8()
    assert np.array_equal(first, second)


def test_duplicate_scan_component_selector_rejected():
    """T.81 B.2.3: scan component selectors shall all be different.
    Fuzz-found: a duplicate mapped two scan slots onto one frame
    component and the dangling component surfaced as a bare KeyError
    deep in the output stage instead of a parse error."""
    import numpy as np

    import jpeglibrary_tpu as jt
    from jpeglibrary_tpu.io.reader import parse_stream
    from jpeglibrary_tpu.syntax.markers import Marker

    rng = np.random.default_rng(5)
    rgb = rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)
    data = bytearray(jt.encode_rgb(rgb, 85))
    for seg in parse_stream(bytes(data)).segments:
        if seg.marker == Marker.SOS:
            # payload = [Ns, (Cs, Td/Ta) * Ns, Ss, Se, AhAl]:
            # overwrite Cs2 with Cs1.
            start = seg.payload_end - len(seg.payload(bytes(data)))
            data[start + 3] = data[start + 1]
            break
    with pytest.raises(Exception) as err:
        jt.decode(bytes(data)).to_rgb8()
    assert "Duplicate scan component" in str(err.value)
    with pytest.raises(Exception):
        jt.decode_rgb8(bytes(data))


def test_bogus_sampling_and_zero_width_rejected():
    """T.81 B.2.2 frame validation (fuzz-found): sampling factors
    outside 1..4 and X == 0 must raise a parse error, like libjpeg's
    JERR_BAD_SAMPLING / JERR_EMPTY_IMAGE — not produce divergent
    garbage or a RuntimeError deep in the transform stage."""
    import numpy as np

    import jpeglibrary_tpu as jt
    from jpeglibrary_tpu.io.reader import parse_stream
    from jpeglibrary_tpu.syntax.markers import Marker

    rng = np.random.default_rng(6)
    rgb = rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)
    good = jt.encode_rgb(rgb, 85)
    sof = next(
        seg for seg in parse_stream(good).segments if seg.marker == Marker.SOF0
    )
    start = sof.payload_end - len(sof.payload(good))

    bad_sampling = bytearray(good)
    bad_sampling[start + 7] = 0x19  # comp 0 sampling -> 1x9
    with pytest.raises(Exception, match="Bogus sampling factor"):
        jt.decode(bytes(bad_sampling))
    with pytest.raises(Exception, match="Bogus sampling factor"):
        jt.decode_rgb8(bytes(bad_sampling))

    zero_width = bytearray(good)
    zero_width[start + 3] = 0
    zero_width[start + 4] = 0  # X = 0
    with pytest.raises(Exception, match="zero samples per line"):
        jt.decode(bytes(zero_width))
    with pytest.raises(Exception, match="zero samples per line"):
        jt.decode_rgb8(bytes(zero_width))


def test_bogus_sample_precision_rejected():
    """T.81 Table B.2 (fuzz-found): a corrupt precision byte (e.g. 40)
    previously blew up 1 << (P-1) downstream as an OverflowError;
    libjpeg raises JERR_BAD_PRECISION at the header."""
    import numpy as np

    import jpeglibrary_tpu as jt
    from jpeglibrary_tpu.io.reader import parse_stream
    from jpeglibrary_tpu.syntax.markers import Marker

    rng = np.random.default_rng(7)
    rgb = rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)
    data = bytearray(jt.encode_rgb(rgb, 85))
    sof = next(
        seg for seg in parse_stream(bytes(data)).segments if seg.marker == Marker.SOF0
    )
    start = sof.payload_end - len(sof.payload(bytes(data)))
    data[start] = 40  # precision byte
    with pytest.raises(Exception, match="Bogus sample precision"):
        jt.decode(bytes(data))
    data[start] = 12  # baseline must be exactly 8 (SOF1 allows 12)
    with pytest.raises(Exception, match="Bogus sample precision"):
        jt.decode(bytes(data))
