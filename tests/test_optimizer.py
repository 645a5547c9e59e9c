"""Optimizer round-trip tests, mirroring OptimizerTests
(tests/JpegLibrary.Tests/Optimizer/OptimizerTests.cs:28-58): output
must be strictly smaller AND decode pixel-identical to the input."""

import numpy as np
import pytest

import jpeglibrary_tpu as jt
from jpeglibrary_tpu.models.optimizer import JpegOptimizeError, optimize

ASSETS = ["baseline/lake.jpg", "baseline/cramps.jpg", "baseline/HETissueSlide.jpg"]


@pytest.mark.parametrize("strip", [True, False], ids=["strip", "no-strip"])
@pytest.mark.parametrize("rel", ASSETS, ids=ASSETS)
def test_optimize_smaller_and_identical(assets_dir, rel, strip):
    data = (assets_dir / rel).read_bytes()
    out = optimize(data, strip=strip)
    assert len(out) < len(data)
    np.testing.assert_array_equal(
        jt.decode(out).to_uint16_extended(), jt.decode(data).to_uint16_extended()
    )


def test_optimize_standard_tables(assets_dir):
    data = (assets_dir / "baseline/lake.jpg").read_bytes()
    out = optimize(data, most_optimal_coding=False)
    np.testing.assert_array_equal(
        jt.decode(out).to_uint16_extended(), jt.decode(data).to_uint16_extended()
    )


def test_progressive_rejected(assets_dir):
    data = (assets_dir / "huffman_progressive/progress.jpg").read_bytes()
    with pytest.raises(JpegOptimizeError, match="Progressive"):
        optimize(data)


def test_lossless_rejected(assets_dir):
    data = (assets_dir / "huffman_lossless/lossless1_s22.jpg").read_bytes()
    with pytest.raises(JpegOptimizeError, match="not supported"):
        optimize(data)


def test_optimize_own_encoder_output_with_restarts_roundtrip(assets_dir):
    """Optimize a stream our encoder produced (no restarts emitted,
    like the reference encoder) and re-decode."""
    rgb = jt.decode((assets_dir / "baseline/lake.jpg").read_bytes()).to_rgb8()
    from jpeglibrary_tpu.models.encoder import encode_rgb

    enc = encode_rgb(rgb, 75)
    out = optimize(enc)
    assert len(out) < len(enc)
    np.testing.assert_array_equal(
        jt.decode(out).to_uint16_extended(), jt.decode(enc).to_uint16_extended()
    )
