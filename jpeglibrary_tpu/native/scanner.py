"""ctypes front-end for the native entropy scanner.

Presents the same call signature as the pure-Python reference scanners
(jpeglibrary_tpu.models.huffman_baseline) so the decoder can swap them
freely; tests assert bit-identical coefficient output between the two.
"""

from __future__ import annotations

import ctypes
import os
from typing import Dict, Sequence

import numpy as np

from ..io.reader import EntropySpan
from ..syntax.frame import FrameHeader, ScanHeader, resolve_scan_components
from ..syntax.huffman import HuffmanDecodingTable
from ..models.geometry import FrameGeometry, frame_geometry
from . import build

_TABLE_BYTES = 824


def pack_huffman_table(t: HuffmanDecodingTable) -> bytes:
    """Serialize to the fixed HuffTable layout in scanner.cpp."""
    out = bytearray()
    out += t.lookahead_size.astype(np.uint8).tobytes()
    out += t.lookahead_value.astype(np.uint8).tobytes()
    out += t.maxcode.astype("<u2").tobytes()
    out += t.valoffset.astype(np.uint8).tobytes()
    out += t.values.astype(np.uint8).tobytes()
    out += b"\x00"
    assert len(out) == _TABLE_BYTES
    return bytes(out)


def default_threads() -> int:
    env = os.environ.get("JPX_SCAN_THREADS")
    if env:
        return int(env)
    # Leave headroom for the JAX runtime/transfer threads.
    return max(1, (os.cpu_count() or 2) - 2)


def decode_baseline_scan(
    data: bytes,
    spans: Sequence[EntropySpan],
    frame: FrameHeader,
    scan: ScanHeader,
    dc_tables: Dict[int, HuffmanDecodingTable],
    ac_tables: Dict[int, HuffmanDecodingTable],
    restart_interval: int,
    coefficient_planes: Dict[int, np.ndarray],
    geometry: FrameGeometry = None,
) -> bool:
    """Native baseline scan decode; returns True when handled.

    Raises the same error types as the Python scanner on corrupt input.
    """
    lib = build.load_library()  # may raise ImportError -> caller falls back
    from ..models.huffman_baseline import JpegDecodeError

    geo = geometry or frame_geometry(frame)
    resolved = resolve_scan_components(frame, scan)

    n = len(resolved)
    comp_h = (ctypes.c_int32 * n)()
    comp_v = (ctypes.c_int32 * n)()
    plane_ptrs = (ctypes.c_void_p * n)()
    plane_wb = (ctypes.c_int64 * n)()
    dc_blob = bytearray()
    ac_blob = bytearray()
    keepalive = []
    for i, (comp_index, fc, sc) in enumerate(resolved):
        dc = dc_tables.get(sc.dc_table_selector)
        ac = ac_tables.get(sc.ac_table_selector)
        if dc is None or ac is None:
            raise JpegDecodeError(
                f"Huffman table of component {comp_index} is not defined."
            )
        cg = geo.components[comp_index]
        comp_h[i] = cg.h
        comp_v[i] = cg.v
        plane = coefficient_planes[comp_index]
        assert plane.dtype == np.int16 and plane.flags.c_contiguous
        keepalive.append(plane)
        plane_ptrs[i] = plane.ctypes.data_as(ctypes.c_void_p)
        plane_wb[i] = plane.shape[1]
        dc_blob += pack_huffman_table(dc)
        ac_blob += pack_huffman_table(ac)

    n_spans = len(spans)
    starts = (ctypes.c_int64 * n_spans)(*[s.start for s in spans])
    ends = (ctypes.c_int64 * n_spans)(*[s.end for s in spans])

    buf = np.frombuffer(data, dtype=np.uint8)
    dc_arr = bytes(dc_blob)
    ac_arr = bytes(ac_blob)

    rc = lib.jpx_decode_baseline_scan(
        buf.ctypes.data_as(ctypes.c_void_p),
        starts, ends, n_spans,
        restart_interval,
        geo.mcus_per_line, geo.mcus_per_column,
        n,
        comp_h, comp_v,
        dc_arr, ac_arr,
        plane_ptrs, plane_wb,
        default_threads(),
    )
    if rc == 2:
        from ..syntax.huffman import JpegHuffmanError

        raise JpegHuffmanError("Invalid Huffman code encountered.")
    if rc == 1:
        raise JpegDecodeError("The bit stream ended prematurely.")
    if rc != 0:
        raise JpegDecodeError(f"native scanner error {rc}")
    return True


def pack_sparse(planes: Sequence[np.ndarray], *, bucket_factor: float = 1.15) -> np.ndarray:
    """Pack dense int16 coefficient planes into interleaved
    (delta uint16, value int16) entries — the 4-byte sparse wire format
    the device unpacks with cumsum + scatter-add. Returns int16 [n, 2]
    (bucket-padded with (0, 0) no-op entries)."""
    lib = build.load_library()
    n = len(planes)
    ptrs = (ctypes.c_void_p * n)()
    sizes = (ctypes.c_int64 * n)()
    keepalive = []
    total = 0
    for i, p in enumerate(planes):
        flat = np.ascontiguousarray(p).reshape(-1)
        keepalive.append(flat)
        ptrs[i] = flat.ctypes.data_as(ctypes.c_void_p)
        sizes[i] = flat.shape[0]
        total += flat.shape[0]
    cap = total + 1024  # worst case: every coefficient nonzero
    out = np.empty((cap, 2), dtype=np.int16)
    written = lib.jpx_pack_sparse(ptrs, sizes, n, out.ctypes.data_as(ctypes.c_void_p), cap)
    if written < 0:
        raise RuntimeError("sparse pack capacity exceeded")
    n_entries = int(written)
    bucket = 1024
    while bucket < n_entries:
        bucket = (int(bucket * bucket_factor) + 1023) & ~1023
    packed = np.zeros((bucket, 2), dtype=np.int16)
    packed[:n_entries] = out[:n_entries]
    return packed
