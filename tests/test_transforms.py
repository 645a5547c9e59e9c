"""Lossless geometric transforms (jpegtran-class, coefficient domain).

jt.transform(data, op) permutes and sign-flips the quantized
coefficients without requantization (transpose also transposes the
quantization tables and swaps sampling factors), so the COEFFICIENT
domain is exact — verified against an independent reimplementation —
and round trips decode bit-identically. Decoded pixels match the
spatially transformed decode up to IDCT rounding reorder (jpegtran
semantics), bounded tightly here. The reference has no such capability
(its only transcoder is the Huffman re-optimizer).
"""

import io

import numpy as np
import pytest
from PIL import Image

import jpeglibrary_tpu as jt
from jpeglibrary_tpu.models.transcode import TRANSFORM_OPS

def assert_pixels_match(got, want):
    """Coefficient-domain transforms are exact; decoded PIXELS may
    differ where the reordered float IDCT rounds differently
    (jpegtran semantics). Bound that tightly instead of requiring
    bit-equality."""
    diff = np.abs(got.astype(int) - want.astype(int))
    assert diff.max() <= 2, diff.max()
    assert (diff > 0).mean() < 1e-3


def coeffs_natural(res):
    from jpeglibrary_tpu.ops.zigzag import BLOCK_TO_ZIGZAG

    out = []
    for i in sorted(res.coefficients):
        p = res.coefficients[i]
        out.append(
            p[..., BLOCK_TO_ZIGZAG].reshape(p.shape[0], p.shape[1], 8, 8)
        )
    return out


SPATIAL = {
    "transpose": lambda p: p.transpose(1, 0, 2),
    "fliph": lambda p: p[:, ::-1],
    "flipv": lambda p: p[::-1, :],
    "rot90": lambda p: p.transpose(1, 0, 2)[:, ::-1],
    "rot270": lambda p: p.transpose(1, 0, 2)[::-1, :],
    "rot180": lambda p: p[::-1, ::-1],
    "transverse": lambda p: p.transpose(1, 0, 2)[::-1, ::-1],
}


def _image(h, w, seed=3):
    rng = np.random.default_rng(seed)
    base = np.linspace(0, 255, w)[None, :, None] + np.linspace(0, 80, h)[:, None, None]
    return np.clip(base + rng.normal(0, 12, (h, w, 3)), 0, 255).astype(np.uint8)


@pytest.mark.parametrize("op", TRANSFORM_OPS)
@pytest.mark.parametrize("subsampling", ["420", "444", "422"])
def test_transform_matches_spatial(op, subsampling):
    rgb = _image(192, 256)
    src = jt.encode_rgb(rgb, 85, subsampling=subsampling)
    ref = np.asarray(jt.decode(src).to_rgb8())
    out = jt.transform(src, op)
    res_out = jt.decode(out)
    got = np.asarray(res_out.to_rgb8())
    assert_pixels_match(got, SPATIAL[op](ref))
    # the coefficient domain is EXACT: transform the input's natural
    # blocks independently and compare
    sign_v = (-1) ** np.arange(8)[None, :]
    sign_u = (-1) ** np.arange(8)[:, None]
    coeff_op = {
        "transpose": lambda c: c.transpose(1, 0, 3, 2),
        "fliph": lambda c: c[:, ::-1] * sign_v,
        "flipv": lambda c: c[::-1, :] * sign_u,
        "rot90": lambda c: c.transpose(1, 0, 3, 2)[:, ::-1] * sign_v,
        "rot270": lambda c: c.transpose(1, 0, 3, 2)[::-1, :] * sign_u,
        "rot180": lambda c: c[::-1, ::-1] * sign_v * sign_u,
        "transverse": lambda c: (c.transpose(1, 0, 3, 2)[:, ::-1] * sign_v)[
            ::-1, :
        ] * sign_u,
    }[op]
    for got_c, src_c in zip(coeffs_natural(res_out), coeffs_natural(jt.decode(src))):
        np.testing.assert_array_equal(got_c, coeff_op(src_c))


@pytest.mark.parametrize("op", ["rot90", "transverse", "fliph"])
def test_transform_grayscale(op):
    g = _image(64, 96)[..., 0]
    from jpeglibrary_tpu.models.encoder import encode_gray

    src = encode_gray(g, 85)
    ref = np.asarray(jt.decode(src).to_uint8())[..., 0]
    got = np.asarray(jt.decode(jt.transform(src, op)).to_uint8())[..., 0]
    assert_pixels_match(got, SPATIAL[op](ref[..., None])[..., 0])


def test_transform_progressive_input_and_output():
    rgb = _image(128, 192, seed=9)
    buf = io.BytesIO()
    Image.fromarray(rgb).save(buf, "JPEG", quality=85, progressive=True, subsampling=2)
    src = buf.getvalue()
    ref = np.asarray(jt.decode(src).to_rgb8())
    out = jt.transform(src, "rot90", mode="progressive")
    got = np.asarray(jt.decode(out).to_rgb8())
    assert_pixels_match(got, SPATIAL["rot90"](ref))
    # PIL agrees on the progressive output
    pil = np.asarray(Image.open(io.BytesIO(out)).convert("RGB"))
    assert pil.shape == got.shape


def test_transform_arithmetic_output_roundtrip():
    rgb = _image(64, 128, seed=4)
    src = jt.encode_rgb(rgb, 80)
    ref = np.asarray(jt.decode(src).to_rgb8())
    out = jt.transform(src, "rot180", mode="arithmetic")
    got = np.asarray(jt.decode(out).to_rgb8())
    assert_pixels_match(got, SPATIAL["rot180"](ref))


def test_transform_round_trip_exact():
    rgb = _image(96, 160, seed=5)
    src = jt.encode_rgb(rgb, 85)
    ref = np.asarray(jt.decode(src).to_rgb8())
    # round trips invert exactly in the coefficient domain, so the
    # decode is BIT-identical to the original decode
    rt = jt.transform(jt.transform(src, "rot90"), "rot270")
    np.testing.assert_array_equal(np.asarray(jt.decode(rt).to_rgb8()), ref)
    rt2 = jt.transform(jt.transform(src, "transverse"), "transverse")
    np.testing.assert_array_equal(np.asarray(jt.decode(rt2).to_rgb8()), ref)


def test_transform_imcu_condition():
    rgb = _image(100, 130, seed=6)  # not iMCU-aligned for 4:2:0
    src = jt.encode_rgb(rgb, 80)
    # transpose needs no alignment
    out = jt.transform(src, "transpose")
    assert jt.decode(out).width == 100
    with pytest.raises(ValueError, match="iMCU"):
        jt.transform(src, "fliph")
    with pytest.raises(ValueError, match="iMCU"):
        jt.transform(src, "rot90")  # height 100 not multiple of 16
    # trim drops the partial edge like jpegtran -trim
    out = jt.transform(src, "fliph", trim=True)
    res = jt.decode(out)
    assert (res.width, res.height) == (128, 100)
    ref = np.asarray(jt.decode(src).to_rgb8())
    got = np.asarray(jt.decode(out).to_rgb8())
    assert_pixels_match(got, ref[:, :128][:, ::-1])


def test_transform_lossless_input():
    rgb = _image(40, 56, seed=7)
    from jpeglibrary_tpu.models.lossless import encode_lossless

    src = encode_lossless(rgb, predictor=4)
    for op in ("rot90", "fliph", "transverse"):
        out = jt.transform(src, op)
        got = np.asarray(jt.decode(out).to_uint8())
        np.testing.assert_array_equal(got, SPATIAL[op](rgb))


def test_transform_preserves_app14():
    ink = np.dstack([_image(32, 48, seed=8), _image(32, 48, seed=9)[..., :1]])
    from jpeglibrary_tpu.models.encoder import encode_cmyk

    src = encode_cmyk(ink, quality=90, ycck=False)
    out = jt.transform(src, "transpose")
    res = jt.decode(out)
    assert res.color_transform == "cmyk"
    ref = np.asarray(jt.decode(src).to_cmyk8())
    got = np.asarray(res.to_cmyk8())
    assert_pixels_match(got, ref.transpose(1, 0, 2))


def test_transform_422_sampling_swap():
    """Transpose of a 4:2:2 stream becomes 4:4:0 (sampling factors swap)."""
    rgb = _image(64, 96, seed=10)
    src = jt.encode_rgb(rgb, 85, subsampling="422")
    out = jt.transform(src, "transpose")
    d = jt.decode(out)
    fc = d.frame.components
    assert (fc[0].horizontal_sampling_factor, fc[0].vertical_sampling_factor) == (1, 2)


def test_transform_unknown_op():
    src = jt.encode_rgb(_image(16, 16), 75)
    with pytest.raises(ValueError, match="unknown transform"):
        jt.transform(src, "rot45")


# -- lossless crop (jpegtran -crop) --


def test_crop_exact():
    rgb = _image(192, 256, seed=11)
    src = jt.encode_rgb(rgb, 85)
    ref = np.asarray(jt.decode(src).to_rgb8())
    # kept blocks are untouched -> the crop decodes BIT-identically
    out = jt.crop(src, 32, 16, 160, 120)
    got = np.asarray(jt.decode(out).to_rgb8())
    np.testing.assert_array_equal(got, ref[16 : 16 + 120, 32 : 32 + 160])


def test_crop_snap_and_errors():
    rgb = _image(96, 128, seed=12)
    src = jt.encode_rgb(rgb, 80)
    ref = np.asarray(jt.decode(src).to_rgb8())
    with pytest.raises(ValueError, match="iMCU"):
        jt.crop(src, 5, 3, 60, 50)
    out = jt.crop(src, 5, 3, 60, 50, snap=True)  # origin -> (0, 0)
    got = np.asarray(jt.decode(out).to_rgb8())
    np.testing.assert_array_equal(got, ref[:53, :65])
    with pytest.raises(ValueError, match="exceeds"):
        jt.crop(src, 0, 0, 129, 96)


def test_crop_progressive_output_and_gray():
    rgb = _image(96, 160, seed=13)
    src = jt.encode_rgb(rgb, 85, subsampling="444")
    ref = np.asarray(jt.decode(src).to_rgb8())
    out = jt.crop(src, 8, 8, 77, 41, mode="progressive")
    got = np.asarray(jt.decode(out).to_rgb8())
    np.testing.assert_array_equal(got, ref[8 : 8 + 41, 8 : 8 + 77])


def test_crop_lossless_input_any_offset():
    rgb = _image(50, 70, seed=14)
    from jpeglibrary_tpu.models.lossless import encode_lossless

    src = encode_lossless(rgb, predictor=2)
    out = jt.crop(src, 3, 7, 33, 21)
    got = np.asarray(jt.decode(out).to_uint8())
    np.testing.assert_array_equal(got, rgb[7 : 7 + 21, 3 : 3 + 33])


# -- EXIF auto-rotation (exiftran class) --


def _with_exif_orientation(rgb, orientation, quality=85):
    buf = io.BytesIO()
    im = Image.fromarray(rgb)
    exif = im.getexif()
    exif[0x0112] = orientation
    im.save(buf, "JPEG", quality=quality, exif=exif.tobytes(), subsampling=2)
    return buf.getvalue()


@pytest.mark.parametrize("orientation,op", [
    (2, "fliph"), (3, "rot180"), (4, "flipv"),
    (5, "transpose"), (6, "rot90"), (7, "transverse"), (8, "rot270"),
])
def test_autorotate_uprights(orientation, op):
    rgb = _image(96, 128, seed=20)
    src = _with_exif_orientation(rgb, orientation)
    from jpeglibrary_tpu.models.transcode import exif_orientation

    assert exif_orientation(src) == orientation
    out = jt.autorotate(src)
    assert exif_orientation(out) is None  # tag gone -> cannot double-apply
    got = np.asarray(jt.decode(out).to_rgb8())
    ref = np.asarray(jt.decode(src).to_rgb8())
    assert_pixels_match(got, SPATIAL[op](ref))
    # PIL's own uprighting agrees pixel-wise (up to decoder rounding),
    # pinning the orientation->op DIRECTION (rot90 vs rot270 etc.)
    from PIL import ImageOps

    pil = np.asarray(
        ImageOps.exif_transpose(Image.open(io.BytesIO(src))).convert("RGB")
    )
    assert pil.shape == got.shape
    mae = np.abs(pil.astype(int) - got.astype(int)).mean()
    assert mae < 3.0, mae


def test_autorotate_noop():
    rgb = _image(48, 64, seed=21)
    plain = jt.encode_rgb(rgb, 80)
    assert jt.autorotate(plain) is plain  # no EXIF -> unchanged
    src1 = _with_exif_orientation(rgb, 1)
    assert jt.autorotate(src1) is src1  # orientation 1 -> unchanged
