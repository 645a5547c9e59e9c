"""Jitted end-to-end device transform pipelines.

The TPU replacement for the reference's per-block output pipeline
(JpegHuffmanBaselineScanDecoder.cs:99-137 block loop + the app-side
writers/converters): one XLA program takes all components' coefficient
planes and produces the final interleaved image, fusing dequantize,
un-zigzag, IDCT, level shift, duplication upsample, crop, clamp and
color conversion.

Compiled programs are cached per frame geometry (static shapes).
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

from ..models.geometry import FrameGeometry
from . import color as color_ops
from . import decode_stage


def _transform_planes(coeffs: Tuple, quants: Tuple, geometry: FrameGeometry, xp):
    """Per-component: zig-zag coeffs [Hb,Wb,64] -> cropped int32 plane [H,W]."""
    planes = []
    for cg, cz, qz in zip(geometry.components, coeffs, quants):
        planes.append(
            decode_stage.component_plane(
                cz, qz, geometry.level_shift, cg.hs, cg.vs,
                geometry.height, geometry.width, xp=xp,
            )
        )
    return tuple(planes)


def transform_to_rgb8(coeffs: Tuple, quants: Tuple, geometry: FrameGeometry, xp=np):
    """Coefficient planes -> [H, W, 3] uint8 RGB.

    Matches the reference JpegDecode app output path: 8-bit clamp writer
    (JpegBufferOutputWriter8Bit.cs:28-60) then the fixed-point YCbCr->RGB
    converter; grayscale images replicate Y with Cb=Cr=128
    (DecodeAction.cs:58-66).
    """
    planes = _transform_planes(coeffs, quants, geometry, xp)
    u8 = [decode_stage.clamp_to_uint8(p, xp=xp) for p in planes]
    if len(u8) == 1:
        y = u8[0]
        half = xp.full_like(y, 128)
        r, g, b = color_ops.ycbcr_to_rgb(y, half, half, xp=xp)
    elif len(u8) == 3:
        r, g, b = color_ops.ycbcr_to_rgb(u8[0], u8[1], u8[2], xp=xp)
    else:
        raise ValueError(f"RGB output needs 1 or 3 components, got {len(u8)}.")
    return xp.stack([r, g, b], axis=-1)


def transform_to_u16(coeffs: Tuple, quants: Tuple, geometry: FrameGeometry, xp=np):
    """Coefficient planes -> [H, W, C] uint16 (extending-writer semantics,
    the golden-fixture format)."""
    planes = _transform_planes(coeffs, quants, geometry, xp)
    ext = [decode_stage.extend_to_uint16(p, geometry.precision, xp=xp) for p in planes]
    return xp.stack(ext, axis=-1)


@functools.lru_cache(maxsize=64)
def jitted_transform(geometry: FrameGeometry, output: str = "rgb8"):
    """Compile (and cache) the transform for one frame geometry.

    Returns a jitted callable(coeffs_tuple, quants_tuple) -> device array.
    """
    import jax
    import jax.numpy as jnp

    if output == "rgb8":
        fn = lambda c, q: transform_to_rgb8(c, q, geometry, xp=jnp)
    elif output == "u16":
        fn = lambda c, q: transform_to_u16(c, q, geometry, xp=jnp)
    else:
        raise ValueError(f"unknown output format {output!r}")
    return jax.jit(fn)
