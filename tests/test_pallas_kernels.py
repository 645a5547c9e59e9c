"""Pallas fused-kernel tests (interpreter mode on the CPU test
platform; the real-TPU path is exercised by bench.py and covered by the
same code).

The interpreter executes via XLA:CPU, which contracts mul+add chains
into FMAs, so float32 results may drift by 1 ulp pre-rounding — hence
the |diff| <= 1 tolerance here. On TPU hardware the kernel matches the
numpy reference bit-for-bit (no contraction observed on axon runs).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from jpeglibrary_tpu.ops import decode_stage
from jpeglibrary_tpu.ops.pallas_kernels import dequantize_idct_shift_pallas


def _assert_rgb_close(a, b):
    """Device (jit) vs host (numpy) RGB: XLA:CPU contracts mul+add into
    FMAs, which can flip a rounding by 1 LSB on rare pixels; on TPU the
    paths match exactly (see test_jit_matches_numpy_bitexact)."""
    a = np.asarray(a).astype(np.int64)
    b = np.asarray(b).astype(np.int64)
    assert a.shape == b.shape
    d = np.abs(a - b)
    assert d.max() <= 1 and (d > 0).mean() < 1e-4, (d.max(), (d > 0).mean())


@pytest.mark.parametrize("n_blocks", [1, 64, 513])
def test_fused_kernel_matches_reference(n_blocks):
    rng = np.random.default_rng(5)
    coeffs = rng.integers(-1024, 1024, size=(n_blocks, 64)).astype(np.int16)
    quant = rng.integers(1, 255, size=64).astype(np.int32)
    ref = decode_stage.dequantize_idct_shift(coeffs, quant, 128)
    out = np.asarray(
        dequantize_idct_shift_pallas(
            jnp.asarray(coeffs), jnp.asarray(quant), 128, interpret=True
        )
    )
    assert out.shape == ref.shape
    assert np.abs(out.astype(np.int64) - ref.astype(np.int64)).max() <= 1


def test_fused_kernel_plane_shape():
    rng = np.random.default_rng(6)
    coeffs = rng.integers(-64, 64, size=(12, 10, 64)).astype(np.int16)
    quant = np.full(64, 16, dtype=np.int32)
    out = np.asarray(
        dequantize_idct_shift_pallas(
            jnp.asarray(coeffs), jnp.asarray(quant), 128, interpret=True
        )
    )
    assert out.shape == (12, 10, 8, 8)


def test_device_sparse_paths_match_dense(assets_dir):
    """Both sparse wire formats (native delta-packed and numpy
    index-packed) must reproduce the dense transform exactly."""
    import jpeglibrary_tpu as jt
    from jpeglibrary_tpu.ops.pipeline import (
        jitted_transform_packed,
        pack_sparse,
    )

    data = (assets_dir / "baseline/lake.jpg").read_bytes()
    r = jt.decode(data)
    dense = r.to_rgb8()
    dense_chw = np.moveaxis(dense, -1, 0)
    # device paths yield planar CHW (lane-friendly wire layout)
    _assert_rgb_close(r.to_rgb8_device(sparse=True), dense_chw)
    _assert_rgb_close(r.to_rgb8_device(sparse=False), dense_chw)
    # numpy fallback packed path
    quants = np.stack(
        [r.quant[c.component_index] for c in r.geometry.components]
    ).astype(np.int32)
    packed = pack_sparse(r.coefficients, r.geometry)
    out = jitted_transform_packed(r.geometry, "rgb8")(packed, quants)
    _assert_rgb_close(out, dense_chw)


def test_native_pack_sparse_roundtrip(assets_dir):
    """The native 4-byte delta format reconstructs the exact planes."""
    pytest.importorskip("jpeglibrary_tpu.native.build")
    import jpeglibrary_tpu as jt
    from jpeglibrary_tpu.native import build as nbuild

    try:
        nbuild.load_library()
    except ImportError:
        pytest.skip("native library unavailable")
    from jpeglibrary_tpu.native.scanner import pack_sparse as native_pack

    data = (assets_dir / "baseline/lake.jpg").read_bytes()
    r = jt.decode(data)
    planes = [r.coefficients[c.component_index] for c in r.geometry.components]
    packed = native_pack(planes)
    # host reconstruction
    deltas = packed[:, 0].astype(np.int64) & 0xFFFF
    vals = packed[:, 1].astype(np.int64)
    pos = np.cumsum(deltas) - 1
    total = sum(p.size for p in planes)
    dense = np.zeros(total, dtype=np.int64)
    np.add.at(dense, pos, vals)
    expected = np.concatenate([p.reshape(-1).astype(np.int64) for p in planes])
    np.testing.assert_array_equal(dense, expected)


def test_decode_stream_rgb(assets_dir):
    """The pipelined streaming decoder yields in-order results identical
    to the per-image path."""
    import jpeglibrary_tpu as jt
    from jpeglibrary_tpu.parallel.batch import decode_stream_rgb

    lake = (assets_dir / "baseline/lake.jpg").read_bytes()
    cramps = (assets_dir / "baseline/cramps.jpg").read_bytes()
    expected = [jt.decode(d).to_rgb8() for d in (lake, cramps, lake)]
    outs = list(decode_stream_rgb([lake, cramps, lake]))
    assert len(outs) == 3
    for o, e in zip(outs, expected):
        # the stream yields planar CHW
        _assert_rgb_close(np.moveaxis(np.asarray(o), 0, -1), e)


def test_batch_decode_rgb_with_mesh(assets_dir):
    """Sparse batch path under a data-parallel mesh matches unsharded."""
    import jax

    import jpeglibrary_tpu as jt
    from jpeglibrary_tpu.parallel.batch import decode_batch_rgb
    from jpeglibrary_tpu.parallel.sharding import make_mesh

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    lake = (assets_dir / "baseline/lake.jpg").read_bytes()
    single = jt.decode(lake).to_rgb8()
    mesh = make_mesh(4, stripe=1)
    outs = decode_batch_rgb([lake] * 4, mesh=mesh)
    for o in outs:
        _assert_rgb_close(o, single)


def test_encode_batch_rgb(assets_dir):
    """Batch encode matches per-image encode byte-for-byte."""
    import jpeglibrary_tpu as jt
    from jpeglibrary_tpu.parallel.batch import encode_batch_rgb

    rgb = jt.decode((assets_dir / "baseline/lake.jpg").read_bytes()).to_rgb8()
    images = [rgb[:256, :256], rgb[256:512, :256], rgb[:256, 256:512]]
    batch = encode_batch_rgb(images, 75)
    for img, blob in zip(images, batch):
        assert blob == jt.encode_rgb(img, 75)


def test_batch_decode_rgb(assets_dir):
    """decode_batch_rgb groups same-geometry images into one stacked
    transform and matches the per-image path."""
    from jpeglibrary_tpu.parallel.batch import decode_batch_rgb
    import jpeglibrary_tpu as jt

    lake = (assets_dir / "baseline/lake.jpg").read_bytes()
    cramps = (assets_dir / "baseline/cramps.jpg").read_bytes()
    out = decode_batch_rgb([lake, cramps, lake])
    single_lake = jt.decode(lake).to_rgb8()
    single_cramps = jt.decode(cramps).to_rgb8()
    _assert_rgb_close(out[0], single_lake)
    _assert_rgb_close(out[1], single_cramps)
    _assert_rgb_close(out[2], single_lake)


@pytest.mark.parametrize("n_blocks", [1, 64, 513])
def test_encode_kernel_matches_reference(n_blocks):
    """Encode twin: level shift + folded FDCT + quantize in one pass,
    within 1 LSB of the numpy GEMM reference (rounding-boundary flips
    from float32 summation order only)."""
    from jpeglibrary_tpu.ops import encode_stage
    from jpeglibrary_tpu.ops.pallas_kernels import fdct_quantize_pallas

    rng = np.random.default_rng(9)
    blocks = rng.integers(0, 256, size=(n_blocks, 64)).astype(np.int32)
    quant = rng.integers(1, 255, size=64).astype(np.int32)
    # numpy reference through the same folded-GEMM math
    shifted = blocks.astype(np.float32) - 128.0
    k = encode_stage.fdct_zigzag_matrix()
    ref = np.rint((shifted @ k) / quant.astype(np.float32)).astype(np.int32)
    out = np.asarray(
        fdct_quantize_pallas(jnp.asarray(blocks), jnp.asarray(quant), interpret=True)
    )
    d = np.abs(out - ref)
    assert d.max() <= 1 and (d > 0).mean() < 1e-3, (d.max(), (d > 0).mean())


def test_device_encode_transform_uses_kernel_consistently():
    """jitted encode path (with or without the Pallas kernel) stays
    within 1 LSB of the host coefficients on a real image."""
    import jpeglibrary_tpu as jt
    from jpeglibrary_tpu.models.encoder import encode_rgb

    rgb = (np.arange(96 * 128 * 3, dtype=np.int64) % 251).reshape(96, 128, 3).astype(np.uint8)
    a = jt.decode(encode_rgb(rgb, 80))
    b = jt.decode(encode_rgb(rgb, 80, xp=jnp))
    for k in a.coefficients:
        d = np.abs(a.coefficients[k].astype(int) - b.coefficients[k].astype(int))
        assert d.max() <= 1
