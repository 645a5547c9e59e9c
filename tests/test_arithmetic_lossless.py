"""Arithmetic lossless (SOF11) + differential (SOF15), T.81 H.2.

Completes the T.81 SOF matrix — neither the reference nor any
mainstream codec implements these processes, so conformance is
self-validated: exhaustive encoder<->decoder round trips over
predictors, precisions, point transforms, restart intervals and
component layouts, plus the all-arithmetic hierarchical pyramid.
"""

import numpy as np
import pytest

import jpeglibrary_tpu as jt
from jpeglibrary_tpu.models.arithmetic_lossless import (
    encode_lossless_arithmetic,
)
from jpeglibrary_tpu.models.hierarchical import encode_hierarchical
from jpeglibrary_tpu.syntax.markers import Marker


def _test_image(h, w, seed=0, precision=8):
    rng = np.random.default_rng(seed)
    base = np.linspace(0, (1 << precision) - 1, w)[None, :] + np.linspace(
        0, (1 << precision) // 3, h
    )[:, None]
    noise = rng.normal(0, (1 << precision) / 20, (h, w))
    return np.clip(base + noise, 0, (1 << precision) - 1).astype(np.int32)


class TestRoundTrip:
    @pytest.mark.parametrize("predictor", [1, 2, 3, 4, 5, 6, 7])
    def test_all_predictors_exact(self, predictor):
        img = _test_image(41, 57, seed=predictor)
        data = encode_lossless_arithmetic(img, predictor=predictor)
        res = jt.decode(data)
        assert res.frame.marker == Marker.SOF11
        assert np.array_equal(res.to_uint8()[..., 0], img.astype(np.uint8))

    @pytest.mark.parametrize("precision", [8, 12, 16])
    def test_precisions_exact(self, precision):
        rng = np.random.default_rng(precision)
        img = rng.integers(0, 1 << precision, (23, 31)).astype(np.int32)
        data = encode_lossless_arithmetic(img, precision=precision, predictor=4)
        res = jt.decode(data)
        out = res.to_uint16_extended()[..., 0] >> (16 - precision)
        assert np.array_equal(out.astype(np.int32), img)

    def test_three_component_exact(self):
        img = _test_image(40, 48, seed=3)
        img3 = np.stack([img, 255 - img, np.roll(img, 9, axis=1)], axis=-1)
        data = encode_lossless_arithmetic(img3, predictor=1)
        res = jt.decode(data)
        assert np.array_equal(res.to_uint8(), img3.astype(np.uint8))

    @pytest.mark.parametrize("interval", [1, 3, 17])
    def test_restart_intervals_exact(self, interval):
        img = _test_image(33, 29, seed=interval)
        data = encode_lossless_arithmetic(
            img, predictor=5, restart_interval=interval
        )
        if interval < 29 * 33:
            assert b"\xff\xd0" in data
        res = jt.decode(data)
        assert np.array_equal(res.to_uint8()[..., 0], img.astype(np.uint8))

    def test_point_transform_round_trip(self):
        img = _test_image(25, 37, seed=9)
        data = encode_lossless_arithmetic(img, predictor=1, point_transform=2)
        res = jt.decode(data)
        # Decoded planes hold the Pt-shifted samples, same convention
        # as the Huffman lossless scanner.
        assert np.array_equal(
            res.planes[0][:25, :37].astype(np.int32), img >> 2
        )

    def test_random_noise_worst_case(self):
        # Maximal-entropy input exercises the large-magnitude ladder
        # (X/M bins) and both conditioning magnitude sets.
        rng = np.random.default_rng(42)
        img = rng.integers(0, 65536, (19, 23)).astype(np.int32)
        data = encode_lossless_arithmetic(img, precision=16, predictor=7)
        res = jt.decode(data)
        out = res.planes[0][:19, :23].astype(np.int32) & 0xFFFF
        assert np.array_equal(out, img)

    def test_conditioning_thresholds(self):
        # Non-default (L, U) changes the context classification on both
        # sides identically.
        img = _test_image(30, 30, seed=11)
        data = encode_lossless_arithmetic(
            img, predictor=2, dc_conditioning=(2, 4)
        )
        res = jt.decode(data)
        assert np.array_equal(res.to_uint8()[..., 0], img.astype(np.uint8))


class TestCompression:
    def test_beats_or_matches_huffman_lossless(self):
        # The adaptive QM coder should land near (usually below) the
        # Huffman lossless size on smooth content.
        from jpeglibrary_tpu.models.lossless import encode_lossless

        img = _test_image(64, 64, seed=1)
        a = encode_lossless_arithmetic(img, predictor=4)
        h = encode_lossless(img, predictor=4)
        assert len(a) < len(h) * 1.1


class TestHierarchicalArithmetic:
    def _sof_markers(self, data):
        from jpeglibrary_tpu.io.reader import parse_stream
        from jpeglibrary_tpu.syntax.markers import ALL_SOF_MARKERS

        return [
            Marker(s.marker)
            for s in parse_stream(data).segments
            if s.marker in ALL_SOF_MARKERS
        ]

    def test_all_arithmetic_lossless_pyramid_exact(self):
        img = _test_image(77, 93, seed=5).astype(np.uint8)
        data = encode_hierarchical(img, levels=3, arithmetic=True)
        assert self._sof_markers(data) == [
            Marker.SOF11, Marker.SOF15, Marker.SOF15,
        ]
        res = jt.decode(data)
        assert np.array_equal(res.to_uint8()[..., 0], img)

    def test_sof15_restart_interval(self):
        img = _test_image(64, 64, seed=6).astype(np.uint8)
        data = encode_hierarchical(
            img, levels=2, arithmetic=True, restart_interval=128
        )
        assert b"\xff\xdd" in data
        res = jt.decode(data)
        assert np.array_equal(res.to_uint8()[..., 0], img)

    def test_full_sof_matrix_decodes(self):
        # One stream touching SOF9 + SOF13 + SOF14 + SOF15 frame types,
        # plus the SOF11 base elsewhere: the complete arithmetic side of
        # Table B.1.
        img = _test_image(48, 48, seed=7).astype(np.uint8)
        dct = encode_hierarchical(
            img, levels=3, base="dct", refinement="dct", arithmetic=True
        )
        assert self._sof_markers(dct) == [
            Marker.SOF9, Marker.SOF13, Marker.SOF15,
        ]
        prog = encode_hierarchical(
            img, levels=2, base="lossless", refinement="progressive",
            arithmetic=True, final_lossless=False,
        )
        assert self._sof_markers(prog) == [Marker.SOF11, Marker.SOF14]
        assert np.array_equal(jt.decode(dct).to_uint8()[..., 0], img)
        out = jt.decode(prog).to_uint8()[..., 0].astype(np.int32)
        assert np.abs(out - img.astype(np.int32)).mean() < 6


class TestRobustness:
    def test_truncated_stream_raises_or_degrades(self):
        img = _test_image(32, 32, seed=8)
        data = encode_lossless_arithmetic(img, predictor=1)
        # Chop mid-entropy-data: must not crash or hang; either raises
        # a decode error or returns (QM decoders pad with 1-bits).
        from jpeglibrary_tpu.models.huffman_baseline import JpegDecodeError

        try:
            jt.decode(data[: len(data) // 2])
        except (JpegDecodeError, ValueError):
            pass

    def test_lone_sof15_rejected(self):
        diff = np.zeros((8, 8), dtype=np.int16)
        data = encode_lossless_arithmetic(diff, differential=True)
        dec = jt.JpegDecoder()
        dec.set_input(data)
        with pytest.raises(ValueError):
            dec.decode()


class TestTranscode:
    def test_sof3_to_sof11_and_back(self):
        from jpeglibrary_tpu.models.lossless import encode_lossless
        from jpeglibrary_tpu.models.transcode import transcode

        img = _test_image(50, 42, seed=13)
        sof3 = encode_lossless(img, predictor=3)
        sof11 = transcode(sof3, "arithmetic")
        assert jt.decode(sof11).frame.marker == Marker.SOF11
        assert np.array_equal(
            jt.decode(sof11).to_uint8(), jt.decode(sof3).to_uint8()
        )
        back = transcode(sof11, "optimal")
        assert jt.decode(back).frame.marker == Marker.SOF3
        assert np.array_equal(
            jt.decode(back).to_uint8(), jt.decode(sof3).to_uint8()
        )

    def test_subsampled_sof3_to_sof11(self):
        from jpeglibrary_tpu.models.lossless import encode_lossless
        from jpeglibrary_tpu.models.transcode import transcode

        img = _test_image(48, 40, seed=14)
        planes = [
            img,
            img[::2, ::2].copy(),
            (255 - img)[::2, ::2].copy(),
        ]
        sof3 = encode_lossless(
            planes, predictor=1, sampling=[(2, 2), (1, 1), (1, 1)],
            size=(48, 40),
        )
        sof11 = transcode(sof3, "arithmetic")
        assert jt.decode(sof11).frame.marker == Marker.SOF11
        a = jt.decode(sof11)
        b = jt.decode(sof3)
        for i in range(3):
            assert np.array_equal(a.planes[i], b.planes[i])


class TestNativeParity:
    """The C++ scanner twins must be BYTE-identical (encode) and
    plane-identical (decode) to the pure-Python implementations."""

    @pytest.fixture(autouse=True)
    def _native(self):
        from jpeglibrary_tpu.native import build

        try:
            build.load_library()
        except ImportError as exc:
            pytest.skip(f"native scanner unavailable: {exc}")

    @pytest.mark.parametrize("predictor,interval", [
        (1, 0), (4, 1), (7, 3), (2, 64), (5, 7),
    ])
    def test_encode_bytes_identical(self, predictor, interval):
        img = _test_image(45, 53, seed=predictor + interval)
        a = encode_lossless_arithmetic(
            img, predictor=predictor, restart_interval=interval,
            use_native=True,
        )
        b = encode_lossless_arithmetic(
            img, predictor=predictor, restart_interval=interval,
            use_native=False,
        )
        assert a == b

    def test_decode_planes_identical(self):
        img = _test_image(61, 47, seed=31)
        data = encode_lossless_arithmetic(
            img, predictor=3, restart_interval=5
        )
        a = jt.JpegDecoder(); a.set_input(data)
        b = jt.JpegDecoder(); b.set_input(data)
        assert np.array_equal(
            a.decode(use_native=True).to_uint8(),
            b.decode(use_native=False).to_uint8(),
        )

    def test_conditioning_parity(self):
        img = _test_image(30, 34, seed=33)
        a = encode_lossless_arithmetic(
            img, predictor=4, dc_conditioning=(2, 5), use_native=True
        )
        b = encode_lossless_arithmetic(
            img, predictor=4, dc_conditioning=(2, 5), use_native=False
        )
        assert a == b
        assert np.array_equal(jt.decode(a).to_uint8()[..., 0],
                              img.astype(np.uint8))

    def test_16bit_parity(self):
        rng = np.random.default_rng(34)
        img = rng.integers(0, 65536, (21, 27)).astype(np.int32)
        a = encode_lossless_arithmetic(
            img, precision=16, predictor=7, restart_interval=4,
            use_native=True,
        )
        b = encode_lossless_arithmetic(
            img, precision=16, predictor=7, restart_interval=4,
            use_native=False,
        )
        assert a == b
        out = jt.decode(a).planes[0][:21, :27].astype(np.int32) & 0xFFFF
        assert np.array_equal(out, img)

    def test_restart_parallel_path_parity(self):
        # Big enough to engage the restart-parallel native decode (many
        # spans, 1x1): must equal the sequential Python twin and the
        # source exactly.
        rng = np.random.default_rng(40)
        img = np.clip(
            np.linspace(0, 255, 160)[None, :] + rng.normal(0, 18, (120, 160)),
            0, 255,
        ).astype(np.int32)
        data = encode_lossless_arithmetic(img, predictor=5, restart_interval=40)
        a = jt.JpegDecoder(); a.set_input(data)
        b = jt.JpegDecoder(); b.set_input(data)
        ra = a.decode(use_native=True).to_uint8()
        rb = b.decode(use_native=False).to_uint8()
        assert np.array_equal(ra, rb)
        assert np.array_equal(ra[..., 0], img.astype(np.uint8))

    @pytest.mark.parametrize("threads", ["1", "2", "4"])
    def test_restart_parallel_thread_counts_identical(self, threads, monkeypatch):
        # The span->thread assignment must not affect output: force the
        # worker count (1 = sequential native path, the gate requires
        # threads > 1) and compare bit-exactly across counts and against
        # the source. 3-component so per-component conditioning state is
        # interleaved within each span.
        rng = np.random.default_rng(41)
        img = np.clip(
            np.linspace(0, 255, 96)[None, :] + rng.normal(0, 25, (80, 96)),
            0, 255,
        ).astype(np.int32)
        img3 = np.stack([img, 255 - img, np.roll(img, 7, axis=0)], axis=-1)
        data = encode_lossless_arithmetic(img3, predictor=1, restart_interval=16)
        monkeypatch.setenv("JPX_SCAN_THREADS", threads)
        dec = jt.JpegDecoder(); dec.set_input(data)
        out = dec.decode(use_native=True).to_uint8()
        assert np.array_equal(out, img3.astype(np.uint8))
