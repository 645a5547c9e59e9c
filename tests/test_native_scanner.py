"""Native C++ scanner parity: bit-identical coefficients vs the
pure-Python reference scanner on every baseline asset."""

import numpy as np
import pytest

import jpeglibrary_tpu as jt

CASES = [
    "baseline/cramps.jpg",
    "baseline/lake.jpg",
    "baseline/HETissueSlide.jpg",
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
    assert set(r_native.coefficients) == set(r_py.coefficients)
    for k in r_native.coefficients:
        np.testing.assert_array_equal(r_native.coefficients[k], r_py.coefficients[k])


def test_native_single_thread_matches(assets_dir, native_lib, monkeypatch):
    monkeypatch.setenv("JPX_SCAN_THREADS", "1")
    data = (assets_dir / "baseline/HETissueSlide.jpg").read_bytes()
    r1 = jt.decode(data, use_native=True)
    monkeypatch.setenv("JPX_SCAN_THREADS", "8")
    r8 = jt.decode(data, use_native=True)
    for k in r1.coefficients:
        np.testing.assert_array_equal(r1.coefficients[k], r8.coefficients[k])
