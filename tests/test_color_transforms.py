"""Adobe APP14 color-transform handling: RGB-coded 3-component
streams, CMYK and YCCK 4-component streams (libjpeg heuristics), in
both directions and cross-validated against PIL."""

import io

import numpy as np
import pytest

import jpeglibrary_tpu as jt

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402


def _img(h, w, c, seed=0):
    rng = np.random.default_rng(seed)
    base = np.linspace(0, 255, w)[None, :, None] + rng.normal(0, 20, (h, w, c))
    return np.clip(base, 0, 255).astype(np.uint8)


def _adobe_app14(transform: int) -> bytes:
    payload = b"Adobe" + bytes([0, 100, 0, 0, 0, 0, transform])
    return bytes([0xFF, 0xEE, 0, len(payload) + 2]) + payload


def _splice_after_soi(data: bytes, segment: bytes) -> bytes:
    assert data[:2] == b"\xff\xd8"
    return data[:2] + segment + data[2:]


class TestCmyk:
    def test_pil_cmyk_round_trip(self):
        img = _img(40, 56, 4, seed=1)
        buf = io.BytesIO()
        Image.fromarray(img, mode="CMYK").save(buf, "JPEG", quality=95)
        data = buf.getvalue()
        r = jt.decode(data)
        assert r.color_transform == "cmyk"
        assert r.adobe_transform == 0
        pil_cmyk = np.asarray(Image.open(io.BytesIO(data)))
        d = np.abs(r.to_cmyk8().astype(int) - pil_cmyk.astype(int))
        assert d.max() <= 2

    def test_pil_cmyk_rgb_view(self):
        img = _img(32, 48, 4, seed=2)
        buf = io.BytesIO()
        Image.fromarray(img, mode="CMYK").save(buf, "JPEG", quality=92)
        data = buf.getvalue()
        pil_rgb = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        d = np.abs(jt.decode(data).to_rgb8().astype(int) - pil_rgb.astype(int))
        assert d.max() <= 2

    def test_four_comp_without_adobe_is_cmyk_uninverted(self):
        # Strip the Adobe tag: channels are taken as stored (no
        # inversion) — the libjpeg convention for untagged 4-comp.
        img = _img(24, 24, 4, seed=3)
        buf = io.BytesIO()
        Image.fromarray(img, mode="CMYK").save(buf, "JPEG", quality=95)
        data = buf.getvalue()
        app14 = data.find(b"\xff\xee")
        seg_len = (data[app14 + 2] << 8) | data[app14 + 3]
        stripped = data[:app14] + data[app14 + 2 + seg_len :]
        r = jt.decode(stripped)
        assert r.adobe_transform is None
        assert r.color_transform == "cmyk"
        tagged = jt.decode(data)
        assert np.array_equal(255 - r.to_cmyk8(), tagged.to_cmyk8())


class TestYcck:
    def test_ycck_round_trip(self):
        # Build a YCCK stream with the real Adobe layout (verified
        # against PIL): the CMY ink values go through the YCbCr forward
        # transform DIRECTLY, K is stored inverted, transform tag 2.
        from jpeglibrary_tpu.models.encoder import JpegEncoder
        from jpeglibrary_tpu.ops import color as color_ops
        from jpeglibrary_tpu.syntax import huffman_standard
        from jpeglibrary_tpu.syntax.quantization import (
            scale_by_quality,
            standard_luminance_table,
        )

        ink = _img(40, 48, 4, seed=4)
        y, cb, cr = color_ops.rgb_to_ycbcr(ink[..., 0], ink[..., 1], ink[..., 2])
        planes = [y, cb, cr, 255 - ink[..., 3]]

        enc = JpegEncoder()
        enc.set_quantization_table(scale_by_quality(standard_luminance_table(0), 95))
        enc.set_huffman_table(True, 0, huffman_standard.dc_luminance())
        enc.set_huffman_table(False, 0, huffman_standard.ac_luminance())
        for i in range(4):
            enc.add_component(i + 1, 0, 0, 0, 1, 1)
        enc.set_input([p.astype(np.uint8) for p in planes])
        data = _splice_after_soi(enc.encode(), _adobe_app14(2))

        r = jt.decode(data)
        assert r.color_transform == "ycck"
        out = r.to_cmyk8()
        d = np.abs(out.astype(int) - ink.astype(int))
        assert d.mean() < 3 and d.max() < 40  # q95 lossy + color round trip

        # PIL agrees on the same stream (IDCT + fixed-point color
        # rounding compound to at most a few levels).
        pil = np.asarray(Image.open(io.BytesIO(data)))
        d2 = np.abs(out.astype(int) - pil.astype(int))
        assert d2.max() <= 3


class TestRgbCoded:
    def _encode_rgb_as_is(self, img, ids):
        from jpeglibrary_tpu.models.encoder import JpegEncoder
        from jpeglibrary_tpu.syntax import huffman_standard
        from jpeglibrary_tpu.syntax.quantization import (
            scale_by_quality,
            standard_luminance_table,
        )

        enc = JpegEncoder()
        enc.set_quantization_table(scale_by_quality(standard_luminance_table(0), 95))
        enc.set_huffman_table(True, 0, huffman_standard.dc_luminance())
        enc.set_huffman_table(False, 0, huffman_standard.ac_luminance())
        for i, cid in enumerate(ids):
            enc.add_component(cid, 0, 0, 0, 1, 1)
        enc.set_input([img[..., i] for i in range(3)])
        return enc.encode()

    def test_rgb_component_ids(self):
        img = _img(32, 40, 3, seed=5)
        data = self._encode_rgb_as_is(img, (0x52, 0x47, 0x42))  # 'R','G','B'
        r = jt.decode(data)
        assert r.color_transform == "rgb"
        d = np.abs(r.to_rgb8().astype(int) - img.astype(int))
        assert d.mean() < 3  # q95 lossy only — NO YCbCr matrix applied
        pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        assert np.abs(r.to_rgb8().astype(int) - pil.astype(int)).max() <= 2

    def test_adobe_transform_zero(self):
        img = _img(32, 40, 3, seed=6)
        data = _splice_after_soi(
            self._encode_rgb_as_is(img, (1, 2, 3)), _adobe_app14(0)
        )
        r = jt.decode(data)
        assert r.color_transform == "rgb"
        assert np.abs(r.to_rgb8().astype(int) - img.astype(int)).mean() < 3

    def test_plain_three_comp_stays_ycbcr(self):
        img = _img(32, 40, 3, seed=7)
        data = jt.encode_rgb(img, 90)
        r = jt.decode(data)
        assert r.color_transform == "ycbcr"

    def test_sparse_fast_path_sees_adobe_and_ids(self):
        # The fused native walk must surface the same color decision as
        # the dense path.
        img = _img(64, 64, 3, seed=8)
        data = self._encode_rgb_as_is(img, (0x52, 0x47, 0x42))
        dec = jt.JpegDecoder()
        dec.set_input(data)
        r = dec.decode(sparse_direct=True)
        assert r.color_transform == "rgb"
        assert np.abs(r.to_rgb8().astype(int) - img.astype(int)).mean() < 3


class TestTranscodePreservesAdobe:
    def test_cmyk_transcode_keeps_colors(self):
        img = _img(40, 48, 4, seed=20)
        buf = io.BytesIO()
        Image.fromarray(img, mode="CMYK").save(buf, "JPEG", quality=95)
        data = buf.getvalue()
        out = jt.transcode(data, "optimal")
        a, b = jt.decode(data), jt.decode(out)
        assert b.adobe_transform == a.adobe_transform
        assert np.array_equal(a.to_cmyk8(), b.to_cmyk8())
        # PIL sees the same colors through the transcoded stream too.
        pa = np.asarray(Image.open(io.BytesIO(data)))
        pb = np.asarray(Image.open(io.BytesIO(out)))
        assert np.array_equal(pa, pb)

    def test_rgb_coded_adobe_zero_survives(self):
        img = _img(32, 40, 3, seed=21)
        base = _splice_after_soi(
            TestRgbCoded()._encode_rgb_as_is(img, (1, 2, 3)), _adobe_app14(0)
        )
        out = jt.transcode(base, "arithmetic")
        assert jt.decode(out).color_transform == "rgb"
        assert np.array_equal(
            jt.decode(base).to_rgb8(), jt.decode(out).to_rgb8()
        )


class TestFancyFourComponent:
    def test_fancy_applies_to_ycck(self):
        # Subsampled YCCK: fancy and duplicate must genuinely differ,
        # and fancy must match PIL (libjpeg merges fancy upsampling
        # into its YCCK path) within rounding.
        from jpeglibrary_tpu.models.encoder import JpegEncoder
        from jpeglibrary_tpu.ops import color as color_ops
        from jpeglibrary_tpu.syntax import huffman_standard
        from jpeglibrary_tpu.syntax.quantization import (
            scale_by_quality,
            standard_luminance_table,
        )

        ink = _img(48, 64, 4, seed=22)
        y, cb, cr = color_ops.rgb_to_ycbcr(ink[..., 0], ink[..., 1], ink[..., 2])
        enc = JpegEncoder()
        enc.set_quantization_table(scale_by_quality(standard_luminance_table(0), 90))
        enc.set_huffman_table(True, 0, huffman_standard.dc_luminance())
        enc.set_huffman_table(False, 0, huffman_standard.ac_luminance())
        enc.add_component(1, 0, 0, 0, 2, 2)
        enc.add_component(2, 0, 0, 0, 1, 1)
        enc.add_component(3, 0, 0, 0, 1, 1)
        enc.add_component(4, 0, 0, 0, 2, 2)
        enc.set_input([
            np.asarray(y, dtype=np.uint8),
            np.asarray(cb, dtype=np.uint8)[::2, ::2].copy(),
            np.asarray(cr, dtype=np.uint8)[::2, ::2].copy(),
            (255 - ink[..., 3]).astype(np.uint8),
        ])
        data = _splice_after_soi(enc.encode(), _adobe_app14(2))
        r = jt.decode(data)
        assert r.color_transform == "ycck"
        dup = r.to_cmyk8(upsample="duplicate")
        fan = r.to_cmyk8(upsample="fancy")
        assert not np.array_equal(dup, fan)
        pil = np.asarray(Image.open(io.BytesIO(data)))
        d = np.abs(fan.astype(int) - pil.astype(int))
        assert d.max() <= 3
        # to_rgb8 honors the flag for 4-component streams too.
        assert not np.array_equal(
            r.to_rgb8(upsample="duplicate"), r.to_rgb8(upsample="fancy")
        )


class TestCmykEncode:
    """encode_cmyk: the inverse of to_cmyk8, cross-checked against PIL
    (the reference has no 4-component or Adobe-tagged encode at all)."""

    def _ink(self):
        rng = np.random.default_rng(13)
        return np.clip(
            np.linspace(40, 215, 64)[None, :, None] + rng.normal(0, 12, (56, 64, 4)),
            0, 255,
        ).astype(np.uint8)

    def test_cmyk_roundtrip_and_pil(self):
        import io

        from PIL import Image

        ink = self._ink()
        data = jt.encode_cmyk(ink, 92)
        res = jt.decode(data)
        assert res.color_transform == "cmyk"
        out = res.to_cmyk8()
        assert np.abs(out.astype(int) - ink.astype(int)).max() <= 24
        pil = Image.open(io.BytesIO(data))
        assert pil.mode == "CMYK"
        assert np.abs(out.astype(int) - np.asarray(pil).astype(int)).max() <= 1

    def test_ycck_roundtrip_and_pil(self):
        import io

        from PIL import Image

        ink = self._ink()
        data = jt.encode_cmyk(ink, 92, ycck=True, subsampling="444")
        res = jt.decode(data)
        assert res.color_transform == "ycck"
        out = res.to_cmyk8()
        # YCbCr transform + quantization round trip
        assert np.abs(out.astype(int) - ink.astype(int)).max() <= 40
        pil = Image.open(io.BytesIO(data))
        assert pil.mode == "CMYK"
        assert np.abs(out.astype(int) - np.asarray(pil).astype(int)).max() <= 3

    def test_ycck_subsampled_fancy_matches_pil(self):
        import io

        from PIL import Image

        ink = self._ink()
        data = jt.encode_cmyk(ink, 92, ycck=True, subsampling="420")
        res = jt.decode(data)
        out = res.to_cmyk8(upsample="fancy")  # PIL fancy-upsamples
        pil = np.asarray(Image.open(io.BytesIO(data)))
        assert np.abs(out.astype(int) - pil.astype(int)).max() <= 3
