"""Syntax-layer unit tests: Huffman LUT construction, quantization
tables, zig-zag maps, header round-trips."""

import numpy as np
import pytest

from jpeglibrary_tpu.ops.zigzag import BLOCK_TO_ZIGZAG, ZIGZAG_TO_BLOCK
from jpeglibrary_tpu.syntax import quantization as q
from jpeglibrary_tpu.syntax.frame import FrameComponent, FrameHeader, ScanComponent, ScanHeader
from jpeglibrary_tpu.syntax.huffman import HuffmanDecodingTable, HuffmanEncodingTable


def test_zigzag_inverse():
    assert (BLOCK_TO_ZIGZAG[ZIGZAG_TO_BLOCK] == np.arange(64)).all()
    assert (ZIGZAG_TO_BLOCK[BLOCK_TO_ZIGZAG] == np.arange(64)).all()


# Annex K.3.1 standard DC luminance table.
DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))


def test_huffman_canonical_codes():
    table = HuffmanDecodingTable.build(0, 0, DC_LUM_BITS, DC_LUM_VALS)
    # Canonical codes for the standard DC luminance table:
    # symbol 0 -> 00 (2 bits), 1 -> 010, ..., 11 -> 111111110 (9 bits)
    size, value = table.lookup(0b00 << 14)
    assert (size, value) == (2, 0)
    size, value = table.lookup(0b010 << 13)
    assert (size, value) == (3, 1)
    size, value = table.lookup((0b111111110 << 7) | 0b1111111)
    assert (size, value) == (9, 11)


def test_huffman_lookup_slow_path():
    """Codes longer than 8 bits go through the maxcode/valoffset path."""
    bits = [0] * 16
    bits[0] = 1  # code 0 (1 bit)
    bits[11] = 2  # two 12-bit codes: 100000000000, 100000000001
    table = HuffmanDecodingTable.build(0, 0, bits, [5, 7, 9])
    assert table.lookup(0x0000) == (1, 5)
    size, value = table.lookup((0b100000000000 << 4) | 0xF)
    assert (size, value) == (12, 7)
    size, value = table.lookup((0b100000000001 << 4) | 0xF)
    assert (size, value) == (12, 9)


def test_huffman_encode_decode_agree():
    enc = HuffmanEncodingTable.build(DC_LUM_BITS, DC_LUM_VALS)
    dec = HuffmanDecodingTable.build(0, 0, DC_LUM_BITS, DC_LUM_VALS)
    for symbol in DC_LUM_VALS:
        code, length = enc.get_code(symbol)
        assert length > 0
        size, value = dec.lookup((code << (16 - length)) | ((1 << (16 - length)) - 1))
        assert (size, value) == (length, symbol)


def test_quality_scaling():
    table = q.standard_luminance_table()
    q50 = q.scale_by_quality(table, 50)
    np.testing.assert_array_equal(q50.elements, table.elements)
    q100 = q.scale_by_quality(table, 100)
    assert (q100.elements == 1).all() or q100.elements.max() <= table.elements.max()
    q10 = q.scale_by_quality(table, 10)
    assert q10.elements.max() <= 255
    assert (q10.elements >= table.elements).all()


def test_quality_estimate_roundtrip():
    # Below ~q25 the 255-clamp in scaling skews the estimate (same in
    # the reference); test the faithful regime.
    for quality in (50, 75, 90):
        tables = {
            0: q.scale_by_quality(q.standard_luminance_table(), quality),
            1: q.scale_by_quality(q.standard_chrominance_table(), quality),
        }
        estimated = q.estimate_quality(tables)
        assert estimated is not None
        assert abs(estimated - quality) <= 1.0


def test_frame_header_roundtrip():
    frame = FrameHeader(
        marker=0xC0,
        sample_precision=8,
        number_of_lines=768,
        samples_per_line=1024,
        components=(
            FrameComponent(1, 2, 2, 0),
            FrameComponent(2, 1, 1, 1),
            FrameComponent(3, 1, 1, 1),
        ),
    )
    parsed = FrameHeader.parse(frame.serialize(), 0xC0)
    assert parsed == frame


def test_scan_header_roundtrip():
    scan = ScanHeader(
        components=(ScanComponent(1, 0, 0), ScanComponent(2, 1, 1)),
        start_of_spectral_selection=1,
        end_of_spectral_selection=5,
        successive_approximation_bit_position_high=2,
        successive_approximation_bit_position_low=1,
    )
    parsed = ScanHeader.parse(scan.serialize())
    assert parsed == scan


def test_dqt_parse_8bit():
    payload = bytes([0x00]) + bytes(range(1, 65))
    tables = q.parse_dqt_segment(payload)
    assert len(tables) == 1
    assert tables[0].identifier == 0
    np.testing.assert_array_equal(tables[0].elements, np.arange(1, 65))


def test_dqt_parse_16bit():
    elements = np.arange(256, 320, dtype=np.uint16)
    payload = bytes([0x10]) + elements.astype(">u2").tobytes()
    tables = q.parse_dqt_segment(payload)
    assert tables[0].element_precision == 1
    np.testing.assert_array_equal(tables[0].elements, elements)
