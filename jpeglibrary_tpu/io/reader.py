"""Host-side JPEG container reader: marker walk and ECS segmentation.

Capability parity with the reference byte-level reader
(/root/reference/src/JpegLibrary/JpegReader.cs:98-166), re-expressed as
a *static* parse: instead of a stateful pull reader interleaved with
scan decoding, the whole stream is walked once on the host and the
entropy-coded spans (split at RSTn boundaries) are recorded. This is
what enables restart-segment-parallel decode on device: all segment
byte ranges are known up front.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

from ..syntax.markers import Marker, STANDALONE_MARKERS, is_restart_marker


class JpegStreamError(ValueError):
    def __init__(self, offset: int, message: str):
        super().__init__(f"Failed to parse JPEG data at offset {offset}. {message}")
        self.offset = offset


@dataclasses.dataclass(frozen=True)
class Segment:
    """A marker segment: marker byte + payload byte range [start, end)."""

    marker: int
    offset: int  # offset of the 0xFF byte of the marker
    payload_start: int
    payload_end: int

    def payload(self, data: bytes) -> bytes:
        return data[self.payload_start : self.payload_end]


@dataclasses.dataclass(frozen=True)
class EntropySpan:
    """One entropy-coded segment (between SOS/RSTn and the next marker).

    ``terminator`` is the marker that ended the span (RSTn, EOI, SOS,
    ...), or None if the stream ended without one.
    """

    start: int
    end: int
    terminator: Optional[int]


@dataclasses.dataclass(frozen=True)
class Scan:
    """A SOS segment plus its entropy-coded spans."""

    header_segment: Segment
    spans: Tuple[EntropySpan, ...]


@dataclasses.dataclass(frozen=True)
class JpegStream:
    """Result of a full container walk."""

    segments: Tuple[Segment, ...]
    scans: Tuple[Scan, ...]
    consumed: int  # bytes consumed through EOI (Identify()-style length)


def _find_marker(data: bytes, pos: int) -> Tuple[Optional[int], int, int]:
    """Find the next marker at/after pos.

    Skips non-0xFF garbage and 0xFF fill bytes, mirroring
    JpegReader.TryReadMarker (JpegReader.cs:120-158).
    Returns (marker_byte_or_None, marker_ff_offset, offset_after_marker).
    """
    n = len(data)
    while pos < n:
        ff = data.find(0xFF, pos)
        if ff < 0:
            return None, n, n
        j = ff + 1
        while j < n and data[j] == 0xFF:  # fill bytes
            j += 1
        if j >= n:
            return None, n, n
        b = data[j]
        if b == 0x00:
            # Stuffed byte — not a marker; keep hunting.
            pos = j + 1
            continue
        return b, j - 1, j + 1
    return None, n, n


def _scan_entropy_spans(data: bytes, pos: int) -> Tuple[List[EntropySpan], int, Optional[int], int]:
    """Scan entropy-coded data starting at pos.

    Splits at RSTn markers; stops at the first non-RSTn marker.
    Returns (spans, position_of_terminating_marker_ff, terminator, pos_after).
    """
    spans: List[EntropySpan] = []
    span_start = pos
    while True:
        marker, ff_off, after = _find_marker(data, pos)
        if marker is None:
            spans.append(EntropySpan(start=span_start, end=len(data), terminator=None))
            return spans, len(data), None, len(data)
        spans.append(EntropySpan(start=span_start, end=ff_off, terminator=marker))
        if is_restart_marker(marker):
            span_start = after
            pos = after
            continue
        return spans, ff_off, marker, after


def parse_stream(data: bytes, *, require_soi: bool = True) -> JpegStream:
    """Walk a complete JPEG stream.

    Stops after EOI (reporting the consumed byte count, like
    JpegDecoder.Identify returning the stream length,
    JpegDecoder.cs:75-104) or at end of data.
    """
    segments: List[Segment] = []
    scans: List[Scan] = []
    n = len(data)

    marker, ff_off, pos = _find_marker(data, 0)
    if require_soi and marker != Marker.SOI:
        raise JpegStreamError(0, "Marker SOI expected.")
    if marker is not None:
        segments.append(Segment(marker=marker, offset=ff_off, payload_start=pos, payload_end=pos))

    consumed = pos
    while pos < n:
        marker, ff_off, pos = _find_marker(data, pos)
        if marker is None:
            consumed = n
            break

        if marker in STANDALONE_MARKERS:
            segments.append(
                Segment(marker=marker, offset=ff_off, payload_start=pos, payload_end=pos)
            )
            consumed = pos
            if marker == Marker.EOI:
                break
            continue

        # Length-prefixed segment.
        if pos + 2 > n:
            raise JpegStreamError(pos, "Unexpected end of input data when reading segment length.")
        length = (data[pos] << 8) | data[pos + 1]
        if length < 2:
            raise JpegStreamError(pos, "Invalid segment length.")
        payload_start = pos + 2
        payload_end = pos + length
        if payload_end > n:
            raise JpegStreamError(pos, "Unexpected end of input data reached.")
        seg = Segment(
            marker=marker, offset=ff_off, payload_start=payload_start, payload_end=payload_end
        )
        segments.append(seg)
        pos = payload_end
        consumed = pos

        if marker == Marker.SOS:
            spans, _term_off, terminator, after = _scan_entropy_spans(data, pos)
            scans.append(Scan(header_segment=seg, spans=tuple(spans)))
            # Resume the marker walk *at* the terminating marker so the
            # main loop processes it (EOI/next SOS/etc.).
            if terminator is None:
                pos = n
                consumed = n
            else:
                pos = spans[-1].end  # offset of the 0xFF of the terminator
                consumed = pos

    return JpegStream(segments=tuple(segments), scans=tuple(scans), consumed=consumed)


def unstuff_entropy_bytes(data: bytes) -> bytes:
    """Remove 0xFF00 byte stuffing and 0xFF fill runs from an ECS span.

    Mirrors the semantics of JpegBitReader.FillBuffer
    (JpegBitReader.cs:95-138): 0xFF 0x00 -> literal 0xFF; a run of
    0xFF 0xFF... collapses (padding); 0xFF <marker> terminates (the span
    passed in should already end before any marker, so this is a
    safety net).
    """
    out = bytearray()
    i = 0
    n = len(data)
    find = data.find
    while True:
        ff = find(0xFF, i)
        if ff < 0:
            out += data[i:]
            return bytes(out)
        out += data[i:ff]
        j = ff + 1
        while j < n and data[j] == 0xFF:
            j += 1
        if j >= n:
            return bytes(out)
        if data[j] == 0x00:
            out.append(0xFF)
            i = j + 1
        else:
            # marker inside span: stop
            return bytes(out)
