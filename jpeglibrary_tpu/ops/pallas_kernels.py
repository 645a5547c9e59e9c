"""Pallas TPU kernels for the decode transform hot path.

The flagship fused kernel (SURVEY.md §2 #15): zig-zag int16 coefficient
blocks -> dequantize -> un-zigzag -> 2-D IDCT -> round -> level shift,
in ONE VMEM pass.

TPU-native formulation: the un-zigzag permutation, both 1-D IDCT passes
and the x0.125 scale are *linear*, so they fold into a single [64, 64]
matrix and the whole transform becomes one MXU matmul per block tile —
no lane shuffles, no in-kernel reshapes (Mosaic rejects 3-D shape
casts), full systolic-array utilization:

    samples[t, :] = rint( (coeff[t, :] * quant[:]) @ K ) + level_shift
    K[zz, 8*i+j]  = 0.125 * M[i, r(zz)] * M[j, c(zz)]

where M is the exact linear map of the reference's 1-D AAN butterfly
(FastFloatingPointDCT.cs:54-196) and (r, c) is the natural position of
zig-zag index zz. The elementwise f32 dequant multiply rounds exactly
like the reference's int-product-to-float conversion (IEEE multiply of
two exactly-representable values). The MXU dot runs at HIGHEST
precision (f32 via multi-pass bf16), so samples match the butterfly
path within 1 LSB after rounding; the bit-exact golden path
(ops.decode_stage) remains the parity reference.
"""

from __future__ import annotations

import functools

import numpy as np

from . import dct
from .zigzag import ZIGZAG_TO_BLOCK


def _idct_matrix_f64() -> np.ndarray:
    """Extract the 1-D IDCT pass as a matrix (the butterfly is linear):
    _idct_1d maps along axis -2, so applying it to I8 yields M itself
    (column k = response to e_k)."""
    return dct._idct_1d(np.eye(8, dtype=np.float64), np)


@functools.lru_cache(maxsize=1)
def fused_transform_matrix() -> np.ndarray:
    """[64, 64] f32: un-zigzag + 2-D IDCT + 0.125 scale folded."""
    m = _idct_matrix_f64()  # out = 0.125 * M @ X @ M.T
    k = np.zeros((64, 64), dtype=np.float64)
    for zz in range(64):
        nat = int(ZIGZAG_TO_BLOCK[zz])
        r, c = nat // 8, nat % 8
        for i in range(8):
            for j in range(8):
                k[zz, 8 * i + j] = 0.125 * m[i, r] * m[j, c]
    return k.astype(np.float32)


def _kernel(coeff_ref, quant_ref, matrix_ref, out_ref, *, level_shift: int):
    import jax
    import jax.numpy as jnp

    coeffs = coeff_ref[...].astype(jnp.float32)  # [T, 64] zig-zag
    quant = quant_ref[...].astype(jnp.float32)  # [1, 64] zig-zag
    deq = coeffs * quant  # == f32(int product), exact IEEE multiply
    pixels = jax.lax.dot_general(
        deq,
        matrix_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    out_ref[...] = jnp.rint(pixels).astype(jnp.int32) + level_shift


@functools.lru_cache(maxsize=16)
def _build_call(n_blocks: int, level_shift: int, tile: int, interpret: bool):
    from .. import enable_compile_cache

    enable_compile_cache()

    import jax
    from jax.experimental import pallas as pl

    grid = (n_blocks // tile,)
    kernel = functools.partial(_kernel, level_shift=level_shift)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, 64), lambda i: (i, 0)),
            pl.BlockSpec((1, 64), lambda i: (0, 0)),
            pl.BlockSpec((64, 64), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tile, 64), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_blocks, 64), jax.numpy.int32),
        interpret=interpret,
    )


def _encode_kernel(samples_ref, quant_ref, matrix_ref, out_ref, *, level_shift: int):
    import jax
    import jax.numpy as jnp

    s = samples_ref[...].astype(jnp.float32) - jnp.float32(level_shift)  # [T, 64]
    zz = jax.lax.dot_general(
        s,
        matrix_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    out_ref[...] = jnp.rint(zz / quant_ref[...].astype(jnp.float32)).astype(jnp.int32)


@functools.lru_cache(maxsize=16)
def _build_encode_call(n_blocks: int, level_shift: int, tile: int, interpret: bool):
    from .. import enable_compile_cache

    enable_compile_cache()

    import jax
    from jax.experimental import pallas as pl

    grid = (n_blocks // tile,)
    kernel = functools.partial(_encode_kernel, level_shift=level_shift)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, 64), lambda i: (i, 0)),
            pl.BlockSpec((1, 64), lambda i: (0, 0)),
            pl.BlockSpec((64, 64), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tile, 64), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_blocks, 64), jax.numpy.int32),
        interpret=interpret,
    )


def fdct_quantize_pallas(blocks_flat, quant_zz, *, level_shift: int = 128,
                         tile: int = 1024, interpret: bool = False):
    """Encode twin of the decode kernel: [N, 64] integer sample blocks
    (row-major 8x8) -> level shift -> folded FDCT + zig-zag (one MXU
    matmul, ops.encode_stage.fdct_zigzag_matrix) -> quantize
    (rint(c / q)) -> int32 [N, 64] zig-zag coefficients, in one fused
    Pallas pass. Matches encode_stage.fdct_quantize within 1 LSB
    (float32 summation-order difference at rounding boundaries)."""
    import jax.numpy as jnp

    from . import encode_stage

    n = blocks_flat.shape[0]
    tile = min(tile, max(8, n))
    pad = (-n) % tile
    flat = blocks_flat
    if pad:
        flat = jnp.concatenate(
            [flat, jnp.full((pad, 64), level_shift, dtype=flat.dtype)], axis=0
        )
    quant = quant_zz.astype(jnp.int32).reshape(1, 64)
    matrix = jnp.asarray(encode_stage.fdct_zigzag_matrix())
    out = _build_encode_call(flat.shape[0], int(level_shift), tile, interpret)(
        flat, quant, matrix
    )
    if pad:
        out = out[:n]
    return out


def dequantize_idct_shift_pallas(coeffs_zz, quant_zz, level_shift: int, *, tile: int = 1024,
                                 interpret: bool = False):
    """[..., 64] zig-zag int16 + [64] quant -> int32 samples [..., 8, 8].

    Drop-in equivalent of ops.decode_stage.dequantize_idct_shift
    (samples within 1 LSB), fused into a single Pallas pass."""
    import jax.numpy as jnp

    lead = coeffs_zz.shape[:-1]
    flat = coeffs_zz.reshape(-1, 64)
    n = flat.shape[0]
    tile = min(tile, max(8, n))
    pad = (-n) % tile
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad, 64), dtype=flat.dtype)], axis=0)
    quant = quant_zz.astype(jnp.int32).reshape(1, 64)
    matrix = jnp.asarray(fused_transform_matrix())
    out = _build_call(flat.shape[0], int(level_shift), tile, interpret)(flat, quant, matrix)
    if pad:
        out = out[:n]
    return out.reshape(lead + (8, 8))
