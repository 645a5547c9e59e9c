"""Baseline (SOF0) decode golden tests.

Mirrors HuffmanSequentialDecodeTests
(tests/JpegLibrary.Tests/Decoder/HuffmanSequentialDecodeTests.cs:26-43):
decode to 16-bit extended samples and assert exact equality against the
committed two-PNG fixtures.
"""

import numpy as np
import pytest

from jpeglibrary_tpu import decode
from jpeglibrary_tpu.utils.fixtures import load_expected_buffer

CASES = [
    ("baseline/cramps.jpg", 1),
    ("baseline/lake.jpg", 3),
]


def _assert_golden(assets_dir, rel, ncomp, **decode_kwargs):
    path = assets_dir / rel
    result = decode(path.read_bytes(), **decode_kwargs)
    assert len(result.planes) == ncomp
    ours = result.to_uint16_extended()
    expected = load_expected_buffer(str(path), ncomp)[..., :ncomp]
    np.testing.assert_array_equal(ours, expected)


@pytest.mark.parametrize("rel,ncomp", CASES, ids=[c[0] for c in CASES])
def test_decode_baseline_numpy(assets_dir, rel, ncomp):
    """Python scanner + NumPy transform stage: bit-exact vs fixtures."""
    _assert_golden(assets_dir, rel, ncomp, use_native=False)


@pytest.mark.parametrize("rel,ncomp", CASES, ids=[c[0] for c in CASES])
def test_decode_baseline_jax(assets_dir, rel, ncomp):
    """JAX (XLA:CPU) transform stage must match bit-for-bit too: the
    float32 AAN butterfly is IEEE add/mul with no reassociation."""
    import jax.numpy as jnp

    _assert_golden(assets_dir, rel, ncomp, use_native=False, xp=jnp)
