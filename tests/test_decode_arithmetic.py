"""Arithmetic-coded decode golden tests (SOF9 sequential, SOF10
progressive), mirroring ArithmeticSequentialDecodeTests /
ArithmeticProgressiveDecodeTests incl. the restart-marker variants that
exercise the statistics/register reset paths."""

import numpy as np
import pytest

from jpeglibrary_tpu import decode
from jpeglibrary_tpu.utils.fixtures import load_expected_buffer

CASES = [
    "arithmetic_sequential/zackthecat_arith.jpg",
    "arithmetic_sequential/zackthecat_arith_restart.jpg",
    "arithmetic_sequential/yellowcat_arith_restart.jpg",
    "arithmetic_progressive/yellowcat_progressive_arith.jpg",
    "arithmetic_progressive/yellowcat_progressive_arith_restart.jpg",
]


@pytest.mark.parametrize("rel", CASES, ids=CASES)
def test_arithmetic_decode(assets_dir, rel):
    path = assets_dir / rel
    result = decode(path.read_bytes())
    ours = result.to_uint16_extended()
    expected = load_expected_buffer(str(path), 3)[..., :3]
    np.testing.assert_array_equal(ours, expected)
