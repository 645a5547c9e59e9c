"""Lossless (SOF3) Huffman predictive decode.

Behavioral parity with the reference
(/root/reference/src/JpegLibrary/ScanDecoder/JpegHuffmanLosslessScanDecoder.cs:52-223):
per-sample Huffman-coded differences (incl. the t==16 -> 32768 special
case), the 7 Annex-H predictors selected by StartOfSpectralSelection,
the 2^(P-Pt-1) initial prediction at scan/restart starts, and int16
wraparound sample storage. Output is one sub-resolution sample plane
per component (ceil(W/hs) x ceil(H/vs)); duplication upsampling to full
resolution happens in the shared output stage, matching
JpegPartialScanlineAllocator.WriteBlock (JpegPartialScanlineAllocator.cs:185-222).

Bit-exactness vs the reference is the gate for this mode (BASELINE.md).
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np

from ..io.bitreader import BitReader
from ..io.reader import EntropySpan
from ..syntax.frame import FrameHeader, ScanHeader, resolve_scan_components
from ..syntax.huffman import HuffmanDecodingTable
from .geometry import ceil_div
from .huffman_baseline import (
    JpegDecodeError,
    decode_huffman_code,
    receive_and_extend,
)
from .huffman_progressive import _SpanCursor, _wrap_int16


def allocate_sample_planes(frame: FrameHeader) -> Dict[int, np.ndarray]:
    """Per-component int16 sample planes on the padded MCU grid.

    Padded to mcusPerLine*h x mcusPerColumn*v so the interleaved decode
    loop never writes out of range; the output stage crops to the true
    component size ceil(W/hs) x ceil(H/vs).
    """
    max_h = frame.max_horizontal_sampling
    max_v = frame.max_vertical_sampling
    mcus_per_line = ceil_div(frame.samples_per_line, max_h)
    mcus_per_column = ceil_div(frame.number_of_lines, max_v)
    out = {}
    for idx, fc in enumerate(frame.components):
        h, v = fc.horizontal_sampling_factor, fc.vertical_sampling_factor
        out[idx] = np.zeros((mcus_per_column * v, mcus_per_line * h), dtype=np.int16)
    return out


def read_sample_lossless(reader: BitReader, table: HuffmanDecodingTable) -> int:
    """ReadSampleLossless (reference :210-223): t==16 means +32768."""
    t = decode_huffman_code(reader, table)
    if t == 16:
        return 32768
    if t != 0:
        t = receive_and_extend(reader, t)
    return t


def decode_lossless_scan(
    data: bytes,
    spans: Sequence[EntropySpan],
    frame: FrameHeader,
    scan: ScanHeader,
    dc_tables: Dict[int, HuffmanDecodingTable],
    restart_interval: int,
    sample_planes: Dict[int, np.ndarray],
) -> None:
    """Decode one lossless scan into the sample planes in place."""
    resolved = resolve_scan_components(frame, scan)
    comps = []
    for comp_index, fc, sc in resolved:
        table = dc_tables.get(sc.dc_table_selector)
        if table is None:
            raise JpegDecodeError(
                f"Huffman table of component {comp_index} is not defined."
            )
        comps.append(
            {
                "index": comp_index,
                "h": fc.horizontal_sampling_factor,
                "v": fc.vertical_sampling_factor,
                "table": table,
                "plane": sample_planes[comp_index],
            }
        )

    max_h = frame.max_horizontal_sampling
    max_v = frame.max_vertical_sampling
    mcus_per_line = ceil_div(frame.samples_per_line, max_h)
    mcus_per_column = ceil_div(frame.number_of_lines, max_v)

    predictor_sel = scan.start_of_spectral_selection
    pt = scan.successive_approximation_bit_position_low
    initial_prediction = 1 << (frame.sample_precision - pt - 1)

    cursor = _SpanCursor(data, spans)
    mcus_before_restart = restart_interval

    for row_mcu in range(mcus_per_column):
        for col_mcu in range(mcus_per_line):
            at_restart_start = restart_interval > 0 and mcus_before_restart == restart_interval
            for comp in comps:
                table = comp["table"]
                h, v = comp["h"], comp["v"]
                plane = comp["plane"]
                offset_x = col_mcu * h
                offset_y = row_mcu * v
                for y in range(v):
                    row = offset_y + y
                    scanline = plane[row]
                    lastline = None if (y == 0 and row_mcu == 0) else plane[row - 1]
                    for x in range(h):
                        diff = read_sample_lossless(cursor.reader, table)
                        cx = offset_x + x
                        if row_mcu == 0 or at_restart_start:
                            # First-line / restart-start prediction
                            # (reference :109-134).
                            if col_mcu == 0 and x == 0:
                                diff += initial_prediction
                            else:
                                ra = int(scanline[cx - 1])
                                rb = initial_prediction if y == 0 else int(lastline[cx])
                                rc = initial_prediction if y == 0 else int(lastline[cx - 1])
                                diff += _predict(predictor_sel, ra, rb, rc)
                        elif col_mcu == 0:
                            # Start of line: Rb (reference :136-139).
                            diff += int(lastline[cx])
                        else:
                            ra = int(scanline[cx - 1])
                            rb = int(lastline[cx])
                            rc = int(lastline[cx - 1])
                            diff += _predict(predictor_sel, ra, rb, rc)
                        scanline[cx] = _wrap_int16(diff)

            # Restart handling (reference :160-177): no predictor state
            # to reset — the restart-start condition above re-seeds it.
            if restart_interval > 0:
                mcus_before_restart -= 1
                if mcus_before_restart == 0:
                    if not cursor.advance_restart():
                        return
                    mcus_before_restart = restart_interval


def _predict(sel: int, ra: int, rb: int, rc: int) -> int:
    """The 7 Annex-H predictors (reference :122-132); 0/unknown -> 0."""
    if sel == 1:
        return ra
    if sel == 2:
        return rb
    if sel == 3:
        return rc
    if sel == 4:
        return ra + rb - rc
    if sel == 5:
        return ra + ((rb - rc) >> 1)
    if sel == 6:
        return rb + ((ra - rc) >> 1)
    if sel == 7:
        return (ra + rb) >> 1
    return 0


def component_sizes(frame: FrameHeader) -> Dict[int, tuple]:
    """True (height, width) of each component's sample plane:
    ceil over the *subsampling* factor (JpegPartialScanlineAllocator.cs:40-46)."""
    max_h = frame.max_horizontal_sampling
    max_v = frame.max_vertical_sampling
    out = {}
    for idx, fc in enumerate(frame.components):
        hs = max_h // fc.horizontal_sampling_factor
        vs = max_v // fc.vertical_sampling_factor
        out[idx] = (
            ceil_div(frame.number_of_lines, vs),
            ceil_div(frame.samples_per_line, hs),
        )
    return out
