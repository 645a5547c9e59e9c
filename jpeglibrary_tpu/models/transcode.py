"""Universal lossless transcoder: any decodable JPEG -> any entropy
coding, preserving the quantized coefficients exactly (jpegtran-class,
and beyond the reference, whose only transcoder is the baseline-input
Huffman re-optimizer, JpegOptimizer.cs — progressive input explicitly
rejected there, JpegOptimizer.cs:580-582).

DCT modes (SOF0/1/2/9/10 input) re-emit the decoded coefficient planes
with the requested entropy coding; lossless (SOF3) input re-encodes
the sample planes with a chosen predictor and fresh optimal tables.
The gate in every case: the transcoded stream decodes bit-identically
to the input.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..syntax.quantization import QuantizationTable
from .decoder import JpegDecoder

# "baseline" and "optimized" both build Huffman tables from the data
# (fixed standard tables would be a pessimization for a transcoder);
# "optimal" selects package-merge, like the reference optimizer's
# MostOptimalCoding.
MODES = (
    "baseline",
    "optimized",
    "optimal",
    "progressive",
    "arithmetic",
    "arithmetic-progressive",
)


def transcode(
    data: bytes,
    mode: str = "optimized",
    *,
    restart_interval: int = 0,
    predictor: Optional[int] = None,
) -> bytes:
    """Re-encode a JPEG losslessly with a different entropy coding.

    ``mode``: one of {"optimized", "optimal", "progressive",
    "arithmetic", "arithmetic-progressive"} for DCT inputs. Lossless
    (SOF3/SOF11) inputs re-encode predictively (``predictor`` overrides
    the input's selector): the arithmetic modes target SOF11, the rest
    SOF3 with fresh optimal tables; the input scan's point transform is
    carried through.
    ``restart_interval`` adds DRI/RSTn seams where the target coding
    supports them (optimized / arithmetic / lossless).

    An Adobe APP14 tag on the input is copied into the output verbatim
    (like jpegtran): the tag changes the stream's color interpretation
    (RGB / CMYK / YCCK), so dropping it would alter decoded colors.
    """
    out = _transcode_inner(
        data, mode, restart_interval=restart_interval, predictor=predictor
    )
    from ..io.reader import parse_stream
    from ..syntax.markers import Marker as _M

    for seg in parse_stream(data).segments:
        if seg.marker == _M.APP14:
            payload = seg.payload(data)
            if len(payload) >= 12 and payload[:5] == b"Adobe":
                assert out[:2] == b"\xff\xd8"
                return out[:2] + data[seg.offset : seg.payload_end] + out[2:]
        if seg.marker == _M.SOS:
            break
    return out


def _transcode_inner(
    data: bytes,
    mode: str = "optimized",
    *,
    restart_interval: int = 0,
    predictor: Optional[int] = None,
) -> bytes:
    dec = JpegDecoder()
    dec.set_input(data)
    res = dec.decode()

    if res.samples is not None:
        # Lossless input (SOF3 or SOF11): re-encode the sample planes
        # predictively (the decoded planes are already the padded
        # per-component MCU grids the interleaved walk covers). The
        # arithmetic modes emit SOF11 (adaptive QM coding), everything
        # else SOF3 with fresh optimal tables — so SOF3 <-> SOF11
        # conversion is just transcode(data, "arithmetic") /
        # transcode(data, "optimal").
        from .arithmetic_lossless import encode_lossless_arithmetic
        from .lossless import encode_lossless

        to_arith = mode in ("arithmetic", "arithmetic-progressive")
        frame = res.frame
        sampling = [
            (fc.horizontal_sampling_factor, fc.vertical_sampling_factor)
            for fc in frame.components
        ]
        all_1x1 = all(s == (1, 1) for s in sampling)
        # The input scan's point transform: decoded planes hold
        # Pt-shifted values, so re-encode must shift them back up and
        # declare the same Pt — a conformant third-party decoder
        # renders sample<<Pt either way.
        from ..io.reader import parse_stream
        from ..syntax.frame import ScanHeader as _SH
        from ..syntax.markers import Marker as _M

        stream = parse_stream(data)
        pt = 0
        for seg in stream.segments:
            if seg.marker == _M.SOS:
                pt = _SH.parse(seg.payload(data)).successive_approximation_bit_position_low
                break
        planes = [
            (res.samples[i].astype(np.int64) & 0xFFFF) << pt
            for i in range(len(frame.components))
        ]
        if restart_interval > 0 and not all_1x1 and not to_arith:
            raise ValueError(
                "restart_interval with sub-sampled Huffman lossless "
                "output is not supported (encode_lossless limitation); "
                "use the arithmetic target or restart_interval=0."
            )

        def enc(sel):
            if all_1x1:
                cropped = [
                    p[: frame.number_of_lines, : frame.samples_per_line]
                    for p in planes
                ]
                if to_arith:
                    return encode_lossless_arithmetic(
                        cropped,
                        precision=frame.sample_precision,
                        predictor=sel,
                        point_transform=pt,
                        restart_interval=restart_interval,
                    )
                return encode_lossless(
                    cropped,
                    precision=frame.sample_precision,
                    predictor=sel,
                    point_transform=pt,
                    restart_interval=restart_interval,
                )
            if to_arith:
                return encode_lossless_arithmetic(
                    planes,
                    precision=frame.sample_precision,
                    predictor=sel,
                    point_transform=pt,
                    sampling=sampling,
                    size=(frame.number_of_lines, frame.samples_per_line),
                    restart_interval=restart_interval,
                )
            return encode_lossless(
                planes,
                precision=frame.sample_precision,
                predictor=sel,
                point_transform=pt,
                sampling=sampling,
                size=(frame.number_of_lines, frame.samples_per_line),
            )

        if predictor is not None:
            return enc(predictor)
        return min((enc(sel) for sel in range(1, 8)), key=len)

    frame = res.frame
    geo = res.geometry
    n_comps = len(frame.components)
    coeffs = [res.coefficients[i] for i in range(n_comps)]

    # Rebuild quantization tables by selector id.
    qts = {}
    for i, fc in enumerate(frame.components):
        qid = fc.quantization_table_selector
        if qid not in qts:
            elements = res.quant[i].astype(np.int64)
            qts[qid] = QuantizationTable(
                element_precision=0 if elements.max() < 256 else 1,
                identifier=qid,
                elements=elements.astype(np.uint16),
            )

    sampling = [
        (fc.horizontal_sampling_factor, fc.vertical_sampling_factor)
        for fc in frame.components
    ]
    quant_ids = [fc.quantization_table_selector for fc in frame.components]
    # statistics/table ids: first component gets 0, the rest share 1
    # (the standard luma/chroma split; generalizes to any comp count <= 4)
    table_ids = [0] + [1] * (n_comps - 1) if n_comps > 1 else [0]

    if mode in ("progressive", "arithmetic-progressive"):
        from .progressive_encoder import SCRIPT_1, SCRIPT_3, encode_progressive

        if n_comps == 3:
            script = SCRIPT_3
        elif n_comps == 1:
            script = SCRIPT_1
        else:
            # generic script: DC all, then per-component full AC bands
            script = [(tuple(range(n_comps)), 0, 0, 0, 1)]
            script += [((i,), 1, 63, 0, 1) for i in range(n_comps)]
            script += [(tuple(range(n_comps)), 0, 0, 1, 0)]
            script += [((i,), 1, 63, 1, 0) for i in range(n_comps)]
        return encode_progressive(
            None,
            qts,
            sampling,
            quant_ids=quant_ids,
            table_ids=table_ids,
            script=script,
            arithmetic=(mode == "arithmetic-progressive"),
            coefficients=coeffs,
            size=(frame.number_of_lines, frame.samples_per_line),
            precision=frame.sample_precision,
        )

    from .encoder import JpegEncoder

    enc = JpegEncoder()
    enc.sample_precision = frame.sample_precision
    enc.restart_interval = restart_interval
    for qt in qts.values():
        enc.set_quantization_table(qt)
    if mode == "arithmetic":
        enc.arithmetic = True
    elif mode in ("optimized", "baseline", "optimal"):
        enc.most_optimal_coding = mode == "optimal"
        for is_dc in (True, False):
            for tid in set(table_ids):
                enc.set_huffman_table(is_dc, tid)  # build from data
    else:
        raise ValueError(f"unknown transcode mode {mode!r}")
    for i, fc in enumerate(frame.components):
        enc.add_component(
            fc.identifier, quant_ids[i], table_ids[i], table_ids[i],
            sampling[i][0], sampling[i][1],
        )
    enc.set_coefficient_planes(
        coeffs, frame.samples_per_line, frame.number_of_lines
    )
    return enc.encode()
