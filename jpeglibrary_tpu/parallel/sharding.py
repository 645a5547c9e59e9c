"""Mesh policy and sharded batch pipelines.

Replaces the reference's "one decoder instance per image, one thread"
model (JpegDecoder.cs:19) with SPMD over a ``jax.sharding.Mesh``:

- axis ``data``: independent images (or restart segments) — the JPEG
  analogue of data parallelism.
- axis ``stripe``: MCU block rows within an image — the sequence/context
  parallel axis for the transform stages (IDCT/upsample/color are
  block-row local, so stripes shard with zero halo).

Encoder/optimizer symbol statistics are reduced across the whole mesh
(the psum-histogram pattern from SURVEY.md §2.4), mirroring how the
reference gathers per-block statistics serially
(JpegEncoder.GatherBlockStatistics, JpegEncoder.cs:551-603).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def make_mesh(n_devices: Optional[int] = None, *, stripe: int = 1):
    """Build a ('data', 'stripe') mesh over the first n devices."""
    import jax
    from jax.sharding import Mesh

    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices % stripe != 0:
        raise ValueError(f"n_devices={n_devices} not divisible by stripe={stripe}")
    devs = np.asarray(devices[:n_devices]).reshape(n_devices // stripe, stripe)
    return Mesh(devs, ("data", "stripe"))


def _bit_category_histogram(values, xp):
    """Count |value| magnitude categories 0..16 — the DC-difference /
    AC-coefficient bit-count statistic the encoder's table builder
    consumes (JpegEncoder.BitCountTable semantics, JpegEncoder.cs:938-996)."""
    mag = xp.abs(values.astype(xp.int32))
    nbits = xp.where(mag == 0, 0, xp.ceil(xp.log2(mag.astype(xp.float32) + 1.0)).astype(xp.int32))
    counts = [xp.sum((nbits == k).astype(xp.int32)) for k in range(17)]
    return xp.stack(counts)


def full_step(y_coeffs, cb_coeffs, cr_coeffs, qt_luma, qt_chroma):
    """The framework's flagship device step over a batch of 4:2:0 images:

    decode transform (dequant + IDCT + level shift + upsample + YCbCr->RGB)
    -> re-encode transform (RGB -> YCbCr, 2x2 box subsample, FDCT, quantize)
    -> global symbol-statistics histogram (all-reduced over the mesh).

    Shapes (B = batch, Hb/Wb = luma blocks):
      y_coeffs  int16 [B, Hb, Wb, 64]      (zig-zag)
      cb/cr     int16 [B, Hb/2, Wb/2, 64]
      qt_luma / qt_chroma  int32 [64]      (zig-zag)

    Returns (rgb uint8 [B, H, W, 3], requant int16 [B, Hb, Wb, 64],
    histogram int32 [17]).
    """
    import jax.numpy as jnp

    from ..ops import color as color_ops
    from ..ops import dct, decode_stage
    from ..ops.zigzag import BLOCK_TO_ZIGZAG

    xp = jnp
    b, hb, wb, _ = y_coeffs.shape
    h, w = hb * 8, wb * 8

    # ---- decode transform ----
    def comp_plane(cz, qz, up):
        s = decode_stage.dequantize_idct_shift(cz, qz, 128, xp=xp)
        plane = xp.transpose(s, (0, 1, 3, 2, 4)).reshape(s.shape[0], s.shape[1] * 8, s.shape[2] * 8)
        if up != 1:
            plane = xp.repeat(xp.repeat(plane, up, axis=1), up, axis=2)
        return plane

    y_plane = comp_plane(y_coeffs, qt_luma, 1)
    cb_plane = comp_plane(cb_coeffs, qt_chroma, 2)
    cr_plane = comp_plane(cr_coeffs, qt_chroma, 2)

    y8 = decode_stage.clamp_to_uint8(y_plane, xp=xp)
    cb8 = decode_stage.clamp_to_uint8(cb_plane, xp=xp)
    cr8 = decode_stage.clamp_to_uint8(cr_plane, xp=xp)
    r, g, bl = color_ops.ycbcr_to_rgb(y8, cb8, cr8, xp=xp)
    rgb = xp.stack([r, g, bl], axis=-1)

    # ---- re-encode transform (luma channel) ----
    y2, _, _ = color_ops.rgb_to_ycbcr(r, g, bl, xp=xp)
    shifted = y2.astype(xp.float32) - 128.0
    blocks = shifted.reshape(b, hb, 8, wb, 8).transpose(0, 1, 3, 2, 4)
    fcoef = dct.fdct8x8(blocks, xp=xp)
    qnat = xp.take(qt_luma, xp.asarray(BLOCK_TO_ZIGZAG), axis=-1).reshape(8, 8)
    requant = xp.rint(fcoef / qnat.astype(xp.float32)).astype(xp.int16)

    # ---- global statistics (histogram all-reduce) ----
    hist = _bit_category_histogram(requant, xp)
    return rgb, requant, hist


def make_sharded_full_step(mesh):
    """pjit full_step over the mesh: batch over 'data', MCU block rows
    over 'stripe'; the histogram output is replicated (XLA inserts the
    all-reduce)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    img = NamedSharding(mesh, P("data", "stripe"))
    tbl = NamedSharding(mesh, P())
    return jax.jit(
        full_step,
        in_shardings=(img, img, img, tbl, tbl),
        out_shardings=(img, img, tbl),
    )


def batched_transform_rgb(coeffs_batch: Sequence, quants, geometry, mesh=None):
    """Decode-transform a batch of same-geometry images to RGB, sharded
    over ``data`` when a mesh is given."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..ops.pipeline import transform_to_rgb8

    stacked = tuple(
        jnp.stack([jnp.asarray(c[i]) for c in coeffs_batch]) for i in range(len(quants))
    )
    fn = jax.jit(
        jax.vmap(
            lambda cs, qs: transform_to_rgb8(cs, qs, geometry, xp=jnp),
            in_axes=(0, None),
        )
    )
    if mesh is not None:
        sharding = NamedSharding(mesh, P("data"))
        stacked = tuple(jax.device_put(s, sharding) for s in stacked)
    return fn(stacked, tuple(jnp.asarray(q) for q in quants))
