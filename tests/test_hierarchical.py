"""Hierarchical JPEG (T.81 Annex J): DHP/EXP + differential lossless.

A capability beyond the reference (yigolden/JpegLibrary rejects
SOF5-7/13-15, JpegDecoder.cs). Round trips must be bit-exact: the final
pyramid stage is differential-lossless, so the decoded full-resolution
image equals the input regardless of the base frame type.
"""

import numpy as np
import pytest

import jpeglibrary_tpu as jt
from jpeglibrary_tpu.models.hierarchical import (
    decode_hierarchical,
    downsample2,
    encode_hierarchical,
    expand_reference,
)
from jpeglibrary_tpu.models.huffman_baseline import JpegDecodeError
from jpeglibrary_tpu.syntax.markers import Marker


def _test_image(h, w, seed=0):
    rng = np.random.default_rng(seed)
    base = np.linspace(0, 255, w)[None, :] + np.linspace(0, 100, h)[:, None]
    return np.clip(base + rng.normal(0, 12, (h, w)), 0, 255).astype(np.uint8)


class TestExpandReference:
    def test_spec_filter_horizontal(self):
        # J.1.1.2: P(2x) = R(x), P(2x+1) = (R(x)+R(x+1)+1)>>1, edge dup.
        r = np.array([[10, 20, 31]], dtype=np.int32)
        out = expand_reference(r, 1, 0)
        assert out.tolist() == [[10, 15, 20, 26, 31, 31]]

    def test_spec_filter_vertical(self):
        r = np.array([[10], [20]], dtype=np.int32)
        out = expand_reference(r, 0, 1)
        assert out.tolist() == [[10], [15], [20], [20]]

    def test_round_trip_with_downsample(self):
        img = _test_image(40, 40).astype(np.int32)
        small = downsample2(img)
        up = expand_reference(small, 1, 1)
        # The pyramid filter approximately inverts expansion: residuals
        # stay small, which is what keeps differential frames compact.
        assert np.abs(up[:40, :40] - img).mean() < 16


class TestRoundTrip:
    @pytest.mark.parametrize("levels", [1, 2, 3, 4])
    def test_gray_exact(self, levels):
        img = _test_image(101, 123)
        data = encode_hierarchical(img, levels=levels)
        res = jt.decode(data)
        assert np.array_equal(res.to_uint8()[..., 0], img)

    def test_three_component_exact(self):
        img = _test_image(96, 80)
        img3 = np.stack([img, 255 - img, np.roll(img, 7, axis=1)], axis=-1)
        data = encode_hierarchical(img3, levels=3)
        res = jt.decode(data)
        assert np.array_equal(res.to_uint8(), img3)

    def test_dct_base_exact_final(self):
        # Lossy base + lossless refinements: final output is exact.
        img = _test_image(64, 64)
        img3 = np.stack([img, img[::-1], 255 - img], axis=-1)
        data = encode_hierarchical(img3, levels=3, base="dct", quality=50)
        res = jt.decode(data)
        assert np.array_equal(res.to_uint8(), img3)

    def test_restart_interval_in_differential_frames(self):
        img = _test_image(70, 90)
        data = encode_hierarchical(img, levels=2, restart_interval=64)
        assert b"\xff\xdd" in data  # DRI present
        res = jt.decode(data)
        assert np.array_equal(res.to_uint8()[..., 0], img)

    @pytest.mark.parametrize("precision", [12, 16])
    def test_high_precision_exact(self, precision):
        rng = np.random.default_rng(3)
        img = rng.integers(0, 1 << precision, (45, 53)).astype(np.int32)
        data = encode_hierarchical(img, precision=precision, levels=2)
        res = jt.decode(data)
        out = res.to_uint16_extended()[..., 0] >> (16 - precision)
        assert np.array_equal(out.astype(np.int32), img)

    def test_python_scanner_parity(self):
        # The pure-Python lossless scanner (sel 0 gating) must agree
        # with the native one on differential frames.
        img = _test_image(33, 47, seed=5)
        data = encode_hierarchical(img, levels=3)
        a = jt.JpegDecoder()
        a.set_input(data)
        b = jt.JpegDecoder()
        b.set_input(data)
        ra = a.decode(use_native=True).to_uint8()
        rb = b.decode(use_native=False).to_uint8()
        assert np.array_equal(ra, rb)

    def test_sparse_direct_falls_through(self):
        # The fused native walk must reject hierarchical streams (the
        # SOF0 base frame alone is NOT the image) and take this path.
        img = _test_image(64, 64)
        img3 = np.stack([img, img, img], axis=-1)
        data = encode_hierarchical(img3, levels=2, base="dct")
        dec = jt.JpegDecoder()
        dec.set_input(data)
        res = dec.decode(sparse_direct=True)
        assert res.width == 64 and res.height == 64
        assert np.array_equal(res.to_uint8(), img3)


class TestStructure:
    def test_identify_reports_dhp_dimensions(self):
        img = _test_image(101, 123)
        data = encode_hierarchical(img, levels=3)
        dec = jt.JpegDecoder()
        dec.set_input(data)
        info = dec.identify()
        # Base frame is 26x31; DHP carries the full resolution.
        assert (info.width, info.height) == (123, 101)
        assert info.marker == Marker.DHP

    def test_frame_count_matches_levels(self):
        img = _test_image(64, 64)
        data = encode_hierarchical(img, levels=3)
        from jpeglibrary_tpu.io.reader import parse_stream

        stream = parse_stream(data)
        sofs = [s for s in stream.segments if s.marker in (Marker.SOF3, Marker.SOF7)]
        exps = [s for s in stream.segments if s.marker == Marker.EXP]
        assert len(sofs) == 3  # one SOF3 base + two SOF7 refinements
        assert sum(1 for s in sofs if s.marker == Marker.SOF7) == 2
        assert len(exps) == 2
        assert len(stream.scans) == 3

    def test_missing_exp_raises(self):
        img = _test_image(64, 64)
        data = encode_hierarchical(img, levels=2)
        exp_seg = b"\xff\xdf\x00\x03\x11"
        assert data.count(exp_seg) == 1
        broken = data.replace(exp_seg, b"")
        dec = jt.JpegDecoder()
        dec.set_input(broken)
        with pytest.raises(JpegDecodeError):
            dec.decode()

    def test_lone_differential_frame_rejected(self):
        # A differential SOF without a DHP is not a valid stream; the
        # single-frame path must refuse it rather than misdecode.
        from jpeglibrary_tpu.models.lossless import encode_lossless

        diff = np.zeros((8, 8), dtype=np.int16)
        data = encode_lossless(diff, differential=True)
        dec = jt.JpegDecoder()
        dec.set_input(data)
        with pytest.raises(ValueError):
            dec.decode()

    def test_dct_base_requires_8bit(self):
        img = np.zeros((16, 16), dtype=np.int32)
        with pytest.raises(ValueError):
            encode_hierarchical(img, precision=12, base="dct")


class TestProgressiveResolution:
    def test_base_frame_decodes_standalone(self):
        # The pyramid's base frame is a plain lossless JPEG: truncating
        # after its scan and closing the stream yields the low-res
        # preview — the hierarchical progression property.
        img = _test_image(96, 96)
        data = encode_hierarchical(img, levels=2)
        from jpeglibrary_tpu.io.reader import parse_stream

        stream = parse_stream(data)
        dhp = next(s for s in stream.segments if s.marker == Marker.DHP)
        exp = next(s for s in stream.segments if s.marker == Marker.EXP)
        preview_stream = (
            data[: dhp.offset] + data[dhp.payload_end : exp.offset] + b"\xff\xd9"
        )
        res = jt.decode(preview_stream)
        assert (res.height, res.width) == (48, 48)
        assert np.array_equal(
            res.to_uint8()[..., 0], downsample2(img.astype(np.int32)).astype(np.uint8)
        )


class TestDctDifferentialFrames:
    """SOF5/SOF13: differential sequential DCT refinements (Annex J) —
    the classic lossy pyramid. Beyond the reference, which rejects
    every hierarchical SOF."""

    def _sof_markers(self, data):
        from jpeglibrary_tpu.io.reader import parse_stream
        from jpeglibrary_tpu.syntax.markers import ALL_SOF_MARKERS

        return [
            Marker(s.marker)
            for s in parse_stream(data).segments
            if s.marker in ALL_SOF_MARKERS
        ]

    def test_dct_refinement_final_lossless_exact(self):
        # SOF0 base + SOF5 middle + SOF7 final: bit-exact output.
        img = _test_image(96, 80)
        data = encode_hierarchical(
            img, levels=3, base="dct", refinement="dct", quality=80
        )
        assert self._sof_markers(data) == [Marker.SOF0, Marker.SOF5, Marker.SOF7]
        res = jt.decode(data)
        assert np.array_equal(res.to_uint8()[..., 0], img)

    def test_fully_lossy_pyramid_close(self):
        img = _test_image(128, 96)
        data = encode_hierarchical(
            img, levels=3, base="dct", refinement="dct",
            final_lossless=False, quality=90,
        )
        assert self._sof_markers(data) == [Marker.SOF0, Marker.SOF5, Marker.SOF5]
        out = jt.decode(data).to_uint8()[..., 0].astype(np.int32)
        err = np.abs(out - img.astype(np.int32))
        assert err.mean() < 4 and err.max() < 48

    def test_three_component_dct_refinement_exact(self):
        img = _test_image(64, 64)
        img3 = np.stack([img, 255 - img, np.roll(img, 5, axis=0)], axis=-1)
        data = encode_hierarchical(
            img3, levels=2, base="lossless", refinement="dct", quality=75
        )
        # final_lossless keeps the single refinement SOF7... levels=2
        # means ONE refinement, which stays lossless. Use 3 levels so a
        # true SOF5 frame exists.
        assert self._sof_markers(data) == [Marker.SOF3, Marker.SOF7]
        data = encode_hierarchical(
            img3, levels=3, base="lossless", refinement="dct", quality=75
        )
        assert self._sof_markers(data) == [Marker.SOF3, Marker.SOF5, Marker.SOF7]
        res = jt.decode(data)
        assert np.array_equal(res.to_uint8(), img3)

    def test_arithmetic_pyramid_sof13(self):
        img = _test_image(80, 72, seed=9)
        data = encode_hierarchical(
            img, levels=3, base="dct", refinement="dct",
            arithmetic=True, quality=85,
        )
        # All-arithmetic pyramid: the final lossless refinement is a
        # SOF15 (arithmetic differential lossless) frame.
        assert self._sof_markers(data) == [Marker.SOF9, Marker.SOF13, Marker.SOF15]
        res = jt.decode(data)
        assert np.array_equal(res.to_uint8()[..., 0], img)

    def test_python_scanner_parity_sof5(self):
        img = _test_image(56, 56, seed=11)
        data = encode_hierarchical(
            img, levels=3, base="dct", refinement="dct", quality=70
        )
        a = jt.JpegDecoder(); a.set_input(data)
        b = jt.JpegDecoder(); b.set_input(data)
        assert np.array_equal(
            a.decode(use_native=True).to_uint8(),
            b.decode(use_native=False).to_uint8(),
        )

    def test_restart_interval_in_sof5(self):
        img = _test_image(88, 88, seed=2)
        data = encode_hierarchical(
            img, levels=3, base="dct", refinement="dct",
            quality=75, restart_interval=4,
        )
        assert b"\xff\xdd" in data
        assert b"\xff\xd0" in data  # RST0 actually emitted
        res = jt.decode(data)
        assert np.array_equal(res.to_uint8()[..., 0], img)

    def test_dct_refinement_requires_8bit(self):
        img = np.zeros((16, 16), dtype=np.int32)
        with pytest.raises(ValueError):
            encode_hierarchical(img, precision=12, refinement="dct")


class TestProgressiveDifferentialFrames:
    """SOF6/SOF14: differential progressive DCT refinements."""

    def _sof_markers(self, data):
        from jpeglibrary_tpu.io.reader import parse_stream
        from jpeglibrary_tpu.syntax.markers import ALL_SOF_MARKERS

        return [
            Marker(s.marker)
            for s in parse_stream(data).segments
            if s.marker in ALL_SOF_MARKERS
        ]

    def test_sof6_refinement_exact(self):
        img = _test_image(96, 80, seed=21)
        data = encode_hierarchical(
            img, levels=3, base="dct", refinement="progressive", quality=80
        )
        assert self._sof_markers(data) == [Marker.SOF0, Marker.SOF6, Marker.SOF7]
        res = jt.decode(data)
        assert np.array_equal(res.to_uint8()[..., 0], img)

    def test_sof6_three_component_lossy_close(self):
        img = _test_image(80, 64, seed=22)
        img3 = np.stack([img, 255 - img, np.roll(img, 3, axis=1)], axis=-1)
        data = encode_hierarchical(
            img3, levels=2, base="dct", refinement="progressive",
            final_lossless=False, quality=90,
        )
        assert self._sof_markers(data) == [Marker.SOF0, Marker.SOF6]
        out = jt.decode(data).to_uint8().astype(np.int32)
        err = np.abs(out - img3.astype(np.int32))
        assert err.mean() < 4 and err.max() < 64

    def test_sof14_arithmetic_exact(self):
        img = _test_image(72, 88, seed=23)
        data = encode_hierarchical(
            img, levels=3, base="dct", refinement="progressive",
            arithmetic=True, quality=85,
        )
        assert self._sof_markers(data) == [Marker.SOF9, Marker.SOF14, Marker.SOF15]
        res = jt.decode(data)
        assert np.array_equal(res.to_uint8()[..., 0], img)

    def test_sof6_python_scanner_parity(self):
        img = _test_image(48, 56, seed=24)
        data = encode_hierarchical(
            img, levels=3, base="dct", refinement="progressive", quality=70
        )
        a = jt.JpegDecoder(); a.set_input(data)
        b = jt.JpegDecoder(); b.set_input(data)
        assert np.array_equal(
            a.decode(use_native=True).to_uint8(),
            b.decode(use_native=False).to_uint8(),
        )

    def test_sof6_matches_sof5_reconstruction(self):
        # Progressive coefficient coding is lossless, so SOF5 and SOF6
        # pyramids of the same quality decode IDENTICALLY.
        img = _test_image(64, 96, seed=25)
        seq = encode_hierarchical(
            img, levels=2, base="dct", refinement="dct",
            final_lossless=False, quality=60,
        )
        prog = encode_hierarchical(
            img, levels=2, base="dct", refinement="progressive",
            final_lossless=False, quality=60,
        )
        assert np.array_equal(
            jt.decode(seq).to_uint8(), jt.decode(prog).to_uint8()
        )

    def test_lone_sof6_rejected(self):
        from jpeglibrary_tpu.models.progressive_encoder import (
            SCRIPT_1, encode_progressive,
        )
        from jpeglibrary_tpu.syntax.quantization import (
            scale_by_quality, standard_luminance_table,
        )

        coeffs = np.zeros((2, 2, 64), dtype=np.int16)
        data = encode_progressive(
            [], [scale_by_quality(standard_luminance_table(0), 75)],
            [(1, 1)], quant_ids=[0], table_ids=[0], script=SCRIPT_1,
            coefficients=[coeffs], size=(16, 16), differential=True,
        )
        dec = jt.JpegDecoder()
        dec.set_input(data)
        with pytest.raises(ValueError):
            dec.decode()
