"""Tolerant (error-recovery) decode: decode(tolerant=True) returns the
decodable portion of corrupt/truncated streams with the failures
recorded in DecodeResult.errors, instead of raising — libjpeg-style
resilience, beyond the reference (which throws, as our default does).
"""

import numpy as np
import pytest

import jpeglibrary_tpu as jt


def _img(h, w, c=3, seed=0):
    rng = np.random.default_rng(seed)
    base = np.linspace(0, 255, w)[None, :, None] + rng.normal(0, 15, (h, w, c))
    return np.clip(base, 0, 255).astype(np.uint8)


def _decode_tolerant(data):
    dec = jt.JpegDecoder()
    dec.set_input(data)
    return dec.decode(tolerant=True)


class TestBaseline:
    def test_truncated_restart_stream_keeps_prefix(self):
        img = _img(120, 160, seed=1)
        data = jt.encode_rgb(img, 80, restart_interval=8)
        full = jt.decode(data).to_rgb8()
        r = _decode_tolerant(data[: len(data) * 2 // 3])
        assert r.errors
        out = r.to_rgb8()
        rows = 120 // 3
        assert np.array_equal(out[:rows], full[:rows])

    def test_byte_flip_mid_stream(self):
        img = _img(96, 96, seed=2)
        data = bytearray(jt.encode_rgb(img, 80, restart_interval=4))
        sos = bytes(data).find(b"\xff\xda")
        pos = sos + (len(data) - sos) // 2
        data[pos] ^= 0x55
        r = _decode_tolerant(bytes(data))
        out = r.to_rgb8()  # must not crash; shape intact
        assert out.shape == (96, 96, 3)

    def test_strict_mode_still_raises(self):
        img = _img(64, 64, seed=3)
        data = jt.encode_rgb(img, 80)
        with pytest.raises(ValueError):
            jt.decode(data[: len(data) // 2])

    def test_clean_stream_has_no_errors(self):
        img = _img(64, 64, seed=4)
        data = jt.encode_rgb(img, 80)
        r = _decode_tolerant(data)
        assert r.errors == []
        assert np.array_equal(r.to_rgb8(), jt.decode(data).to_rgb8())

    def test_nothing_decodable_still_raises(self):
        img = _img(32, 32, seed=5)
        data = jt.encode_rgb(img, 80)
        sos = data.find(b"\xff\xda")
        # Cut before any entropy data: no scan decodes at all.
        with pytest.raises(ValueError):
            _decode_tolerant(data[: sos + 3])


class TestProgressive:
    def test_corrupt_late_scan_keeps_earlier_passes(self):
        from jpeglibrary_tpu.models.progressive_encoder import (
            encode_progressive_rgb,
        )

        img = _img(96, 112, seed=6)
        data = encode_progressive_rgb(img, 80)
        full = jt.decode(data).to_rgb8().astype(np.int32)
        # Truncate inside the LAST scan: early DC/AC passes survive, so
        # the tolerant result approximates the image.
        r = _decode_tolerant(data[: int(len(data) * 0.9)])
        assert r.errors
        out = r.to_rgb8().astype(np.int32)
        assert np.abs(out - full).mean() < 16

    def test_truncated_mid_script(self):
        from jpeglibrary_tpu.models.progressive_encoder import (
            encode_progressive_rgb,
        )

        img = _img(80, 80, seed=7)
        data = encode_progressive_rgb(img, 75)
        r = _decode_tolerant(data[: len(data) // 2])
        assert r.errors
        assert r.to_rgb8().shape == (80, 80, 3)


class TestOtherModes:
    def test_lossless_truncation(self):
        from jpeglibrary_tpu.models.lossless import encode_lossless

        img = _img(64, 64, 1, seed=8)[..., 0].astype(np.int32)
        data = encode_lossless(img, predictor=4, restart_interval=16)
        r = _decode_tolerant(data[: len(data) * 2 // 3])
        assert r.errors
        assert r.to_uint8().shape == (64, 64, 1)

    def test_arithmetic_truncation(self):
        img = _img(64, 64, seed=9)
        data = jt.encode_rgb(img, 80, arithmetic=True, restart_interval=8)
        r = _decode_tolerant(data[: len(data) * 2 // 3])
        # QM decoders pad with 1-bits at stream end, so truncation may
        # decode "successfully" with garbage tail or error — either
        # way the result materializes.
        assert r.to_rgb8().shape == (64, 64, 3)

    def test_sof11_truncation(self):
        img = _img(48, 48, 1, seed=10)[..., 0].astype(np.int32)
        data = jt.encode_lossless_arithmetic(img, predictor=2)
        r = _decode_tolerant(data[: len(data) * 2 // 3])
        assert r.to_uint8().shape == (48, 48, 1)


class TestTolerantTables:
    def test_progressive_bad_dqt_id_records_not_raises(self):
        from jpeglibrary_tpu.models.progressive_encoder import (
            encode_progressive_rgb,
        )

        img = _img(64, 64, seed=30)
        data = bytearray(encode_progressive_rgb(img, 80))
        # Point the CHROMA components at DQT slot 3 (never defined):
        # scans touching them fail table validation, luma-only scans
        # still decode.
        sof = bytes(data).find(b"\xff\xc2")
        ncomp = data[sof + 9]
        for i in range(1, ncomp):
            data[sof + 10 + 3 * i + 2] = 3
        dec = jt.JpegDecoder()
        dec.set_input(bytes(data))
        with pytest.raises(ValueError):
            dec.decode()
        dec2 = jt.JpegDecoder()
        dec2.set_input(bytes(data))
        r = dec2.decode(tolerant=True)
        assert r.errors  # recorded, not raised
        assert r.to_rgb8().shape == (64, 64, 3)
