"""Golden decode tests for every Huffman mode beyond baseline.

Mirrors the reference test matrix (SURVEY.md §4):
HuffmanSequentialDecodeTests (12-bit SOF1), HuffmanProgressiveDecodeTests
(incl. restart-interval variant), HuffmanLosslessDecodeTests (the 7
predictors). All asserts are exact equality on the 16-bit
extending-writer output vs the committed two-PNG fixtures.
"""

import numpy as np
import pytest

from jpeglibrary_tpu import decode
from jpeglibrary_tpu.utils.fixtures import load_expected_buffer

SEQUENTIAL_CASES = [
    ("huffman_sequential/testorig12.jpg", 3),
]

PROGRESSIVE_CASES = [
    ("huffman_progressive/progress.jpg", 3),
    ("huffman_progressive/yellowcat_progressive_restart.jpg", 3),
]

LOSSLESS_CASES = [(f"huffman_lossless/lossless{i}_s22.jpg", 3) for i in range(1, 8)]


def _assert_golden(assets_dir, rel, ncomp, **decode_kwargs):
    path = assets_dir / rel
    result = decode(path.read_bytes(), **decode_kwargs)
    ours = result.to_uint16_extended()
    expected = load_expected_buffer(str(path), ncomp)[..., :ncomp]
    np.testing.assert_array_equal(ours, expected)


@pytest.mark.parametrize("rel,ncomp", SEQUENTIAL_CASES, ids=[c[0] for c in SEQUENTIAL_CASES])
def test_extended_sequential_12bit(assets_dir, rel, ncomp):
    _assert_golden(assets_dir, rel, ncomp, use_native=False)
    _assert_golden(assets_dir, rel, ncomp, use_native=True)


@pytest.mark.parametrize("rel,ncomp", PROGRESSIVE_CASES, ids=[c[0] for c in PROGRESSIVE_CASES])
def test_progressive(assets_dir, rel, ncomp):
    _assert_golden(assets_dir, rel, ncomp)


@pytest.mark.parametrize("rel,ncomp", LOSSLESS_CASES, ids=[c[0] for c in LOSSLESS_CASES])
def test_lossless_bit_exact(assets_dir, rel, ncomp):
    _assert_golden(assets_dir, rel, ncomp)


def test_progressive_chain_pipeline_matches_python(assets_dir):
    """The watermark-pipelined chain decoder (single-component scans in
    parallel threads, gated per unit) must match the pure-Python
    scanners bit-exactly on a multi-scan script with successive
    approximation refinement (PIL/libjpeg's standard progression)."""
    pytest.importorskip("PIL")
    import io

    import numpy as np
    from PIL import Image

    import jpeglibrary_tpu as jt

    rgb = jt.decode((assets_dir / "baseline/lake.jpg").read_bytes()).to_rgb8()
    buf = io.BytesIO()
    Image.fromarray(rgb).save(buf, "JPEG", quality=80, progressive=True, subsampling=2)
    prog = buf.getvalue()
    nat = jt.decode(prog)
    ref = jt.decode(prog, use_native=False)
    for k in ref.coefficients:
        np.testing.assert_array_equal(ref.coefficients[k], nat.coefficients[k])
