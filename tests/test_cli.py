"""CLI smoke tests for the four apps (decode/encode/optimize/debugdump),
mirroring the reference apps' flows end to end through temp files."""

import numpy as np

import jpeglibrary_tpu as jt
from jpeglibrary_tpu.cli import debugdump, decode as cli_decode, encode as cli_encode, optimize as cli_optimize
from jpeglibrary_tpu.utils.fixtures import load_expected_buffer


def test_decode_encode_optimize_cli(assets_dir, tmp_path):
    src = str(assets_dir / "baseline/lake.jpg")
    png = str(tmp_path / "lake.png")
    jpg = str(tmp_path / "re.jpg")
    opt = str(tmp_path / "opt.jpg")

    assert cli_decode.main([src, png]) == 0
    assert cli_encode.main([png, jpg, "--quality", "75", "--optimize-coding"]) == 0
    assert cli_optimize.main([jpg, opt]) == 0

    from PIL import Image

    with Image.open(png) as im:
        assert im.size == (1024, 768)
    r = jt.decode(open(opt, "rb").read())
    assert (r.width, r.height) == (1024, 768)


def test_transcode_cli(assets_dir, tmp_path):
    from jpeglibrary_tpu.cli import transcode as cli_transcode

    src = str(assets_dir / "huffman_progressive/progress.jpg")
    out = str(tmp_path / "t.jpg")
    assert cli_transcode.main([src, out, "--mode", "arithmetic"]) == 0
    a = jt.decode(open(src, "rb").read())
    b = jt.decode(open(out, "rb").read())
    for k in a.coefficients:
        np.testing.assert_array_equal(a.coefficients[k], b.coefficients[k])


def test_debugdump_fixture_roundtrip(assets_dir, tmp_path):
    """Our debugdump output must reload into exactly the decoded buffer
    (the reference's self-recorded golden scheme)."""
    src = str(assets_dir / "baseline/cramps.jpg")
    prefix = str(tmp_path / "cramps.jpg")
    assert debugdump.main([src, "--output-prefix", prefix]) == 0

    result = jt.decode(open(src, "rb").read())
    expected = result.to_uint16_extended()
    reloaded = load_expected_buffer(prefix, 1)[..., :1]
    np.testing.assert_array_equal(reloaded, expected)


def test_transform_cli(assets_dir, tmp_path):
    from jpeglibrary_tpu.cli import transcode as cli_transcode

    src = str(assets_dir / "baseline/lake.jpg")
    out = str(tmp_path / "r.jpg")
    assert cli_transcode.main([src, out, "--transform", "transpose"]) == 0
    a = jt.decode(open(src, "rb").read())
    b = jt.decode(open(out, "rb").read())
    assert (b.width, b.height) == (a.height, a.width)
    # coefficient-exact; pixels may differ by IDCT rounding (jpegtran
    # semantics) — bound it tightly
    diff = np.abs(
        np.asarray(b.to_rgb8()).astype(int)
        - np.asarray(a.to_rgb8()).transpose(1, 0, 2).astype(int)
    )
    assert diff.max() <= 2 and (diff > 0).mean() < 1e-3


def test_crop_cli(assets_dir, tmp_path):
    from jpeglibrary_tpu.cli import transcode as cli_transcode

    src = str(assets_dir / "baseline/lake.jpg")
    out = str(tmp_path / "c.jpg")
    assert cli_transcode.main([src, out, "--crop", "16", "16", "200", "100"]) == 0
    a = jt.decode(open(src, "rb").read())
    b = jt.decode(open(out, "rb").read())
    assert (b.width, b.height) == (200, 100)
    np.testing.assert_array_equal(
        np.asarray(b.to_rgb8()),
        np.asarray(a.to_rgb8())[16 : 16 + 100, 16 : 16 + 200],
    )
