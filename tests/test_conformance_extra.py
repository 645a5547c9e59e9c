"""Extra conformance coverage: 16-bit DQT wire format, precision-aware
8-bit output, mixed-mode streaming."""

import numpy as np

import jpeglibrary_tpu as jt
from jpeglibrary_tpu.io import reader as io_reader
from jpeglibrary_tpu.syntax.markers import Marker
from jpeglibrary_tpu.syntax.quantization import QuantizationTable, parse_dqt_segment


def test_16bit_dqt_roundtrip(assets_dir):
    """Rewrite lake.jpg's DQT segment with Pq=1 (16-bit elements,
    JpegQuantizationTable.cs:22-57); same values -> identical decode."""
    data = (assets_dir / "baseline/lake.jpg").read_bytes()
    stream = io_reader.parse_stream(data)
    dqt = next(s for s in stream.segments if s.marker == Marker.DQT)
    tables = parse_dqt_segment(dqt.payload(data))
    payload16 = b"".join(
        QuantizationTable(1, t.identifier, t.elements).serialize() for t in tables
    )
    rebuilt = bytearray(data[: dqt.offset])
    rebuilt += bytes([0xFF, Marker.DQT])
    rebuilt += bytes([(len(payload16) + 2) >> 8, (len(payload16) + 2) & 0xFF])
    rebuilt += payload16
    rebuilt += data[dqt.payload_end :]

    out16 = jt.decode(bytes(rebuilt))
    out8 = jt.decode(data)
    np.testing.assert_array_equal(out16.to_uint16_extended(), out8.to_uint16_extended())


def test_12bit_to_uint8_precision_normalized(assets_dir):
    """>8-bit samples shift right by p-8 (GreaterThan8Bit writer)."""
    r = jt.decode((assets_dir / "huffman_sequential/testorig12.jpg").read_bytes())
    u8 = r.to_uint8()
    u16 = r.to_uint16_extended()
    np.testing.assert_array_equal(
        u8.astype(np.int32), np.clip(u16.astype(np.int32) >> 8, 0, 255)
    )


def test_odd_dimensions_roundtrip():
    """Encode+decode at awkward sizes (1x1 up to non-multiple-of-MCU):
    padding, box subsample and crop must all agree between the native
    and Python scanners and produce the exact requested dimensions."""
    rng = np.random.default_rng(0)
    for (h, w) in [(1, 1), (1, 8), (7, 5), (17, 33), (64, 63), (65, 66)]:
        for sub in ("420", "444"):
            rgb = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            enc = jt.encode_rgb(rgb, 80, subsampling=sub)
            rn = jt.decode(enc, use_native=True)
            rp = jt.decode(enc, use_native=False)
            assert rn.to_uint16_extended().shape == (h, w, 3)
            np.testing.assert_array_equal(
                rn.to_uint16_extended(), rp.to_uint16_extended()
            )
    gray = rng.integers(0, 256, size=(7, 5), dtype=np.uint8)
    r = jt.decode(jt.encode_gray(gray, 80))
    assert r.to_uint8().shape == (7, 5, 1)


def test_stream_mixed_modes(assets_dir):
    """The streaming decoder handles DCT + lossless modes in one batch."""
    from jpeglibrary_tpu.parallel.batch import decode_stream_rgb

    datas = [
        (assets_dir / "baseline/lake.jpg").read_bytes(),
        (assets_dir / "huffman_lossless/lossless2_s22.jpg").read_bytes(),
        (assets_dir / "arithmetic_sequential/zackthecat_arith.jpg").read_bytes(),
        (assets_dir / "huffman_progressive/progress.jpg").read_bytes(),
    ]
    expected = [jt.decode(d).to_rgb8() for d in datas]
    outs = [np.moveaxis(np.asarray(o), 0, -1) for o in decode_stream_rgb(datas)]
    for o, e in zip(outs, expected):
        assert o.shape == e.shape
        assert np.abs(o.astype(np.int64) - e.astype(np.int64)).max() <= 1
