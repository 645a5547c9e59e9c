"""Native C++ scanner parity: bit-identical coefficients/samples vs the
pure-Python reference scanners across every entropy-coding mode."""

import numpy as np
import pytest

import jpeglibrary_tpu as jt

CASES = [
    "baseline/cramps.jpg",
    "baseline/lake.jpg",
    "baseline/HETissueSlide.jpg",
    "huffman_sequential/testorig12.jpg",
    "huffman_progressive/progress.jpg",
    "huffman_progressive/yellowcat_progressive_restart.jpg",
    "huffman_lossless/lossless1_s22.jpg",
    "huffman_lossless/lossless7_s22.jpg",
    "arithmetic_sequential/zackthecat_arith.jpg",
    "arithmetic_sequential/yellowcat_arith_restart.jpg",
    "arithmetic_progressive/yellowcat_progressive_arith.jpg",
    "arithmetic_progressive/yellowcat_progressive_arith_restart.jpg",
]


@pytest.fixture(scope="module")
def native_lib():
    from jpeglibrary_tpu.native import build

    try:
        return build.load_library()
    except ImportError as exc:
        pytest.skip(f"native scanner unavailable: {exc}")


@pytest.mark.parametrize("rel", CASES, ids=CASES)
def test_native_matches_python(assets_dir, native_lib, rel):
    data = (assets_dir / rel).read_bytes()
    r_native = jt.decode(data, use_native=True)
    r_py = jt.decode(data, use_native=False)
    if r_native.coefficients is not None:
        assert set(r_native.coefficients) == set(r_py.coefficients)
        for k in r_native.coefficients:
            np.testing.assert_array_equal(
                r_native.coefficients[k], r_py.coefficients[k]
            )
    else:  # lossless: sample planes
        for k in r_native.samples:
            np.testing.assert_array_equal(r_native.samples[k], r_py.samples[k])


def test_native_single_thread_matches(assets_dir, native_lib, monkeypatch):
    monkeypatch.setenv("JPX_SCAN_THREADS", "1")
    data = (assets_dir / "baseline/HETissueSlide.jpg").read_bytes()
    r1 = jt.decode(data, use_native=True)
    monkeypatch.setenv("JPX_SCAN_THREADS", "8")
    r8 = jt.decode(data, use_native=True)
    for k in r1.coefficients:
        np.testing.assert_array_equal(r1.coefficients[k], r8.coefficients[k])
