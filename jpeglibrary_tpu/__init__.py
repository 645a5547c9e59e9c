"""jpeglibrary_tpu — a TPU-native JPEG codec framework.

A from-scratch re-design of the capability matrix of
yigolden/JpegLibrary (the reference C# library mounted at
/root/reference) for JAX/XLA/Pallas on TPU:

- decode: every T.81 Table B.1 process — baseline (SOF0/1),
  progressive (SOF2), lossless (SOF3), arithmetic (SOF9/10/11),
  hierarchical (SOF5-7/13-15); one-call fused host RGB (decode_rgb8);
  span-skipping region-of-interest decode (decode_region)
- encode: the same complete matrix (baseline std/optimized/
  package-merge, progressive, lossless, arithmetic, hierarchical,
  CMYK/YCCK, 12-bit, bufferless streaming, restart emission)
- transcode/transform: universal lossless entropy re-coding,
  jpegtran-class rotations/flips/crop/autorotate, optimizer
- batched, sharded multi-image pipelines over jax.sharding meshes

Architecture: host container parsing -> entropy decode (native C++
scanner / restart-segment parallel) -> batched device transform kernels
(dequant + IDCT + upsample + color) -> output formatting.
"""

_COMPILE_CACHE_CHECKED = False


def enable_compile_cache() -> None:
    """Persistent XLA compilation cache, TPU backends only
    (JPX_COMPILE_CACHE=0 disables; JPX_COMPILE_CACHE_DIR overrides the
    location). Remote-compile TPU backends take minutes per program;
    the disk cache makes every process after the first start hot.
    Restricted to TPU because XLA:CPU caches AOT machine code whose
    machine-feature assumptions don't transfer across hosts (observed
    producing wrong numerics when loaded elsewhere).

    Called lazily from the device pipeline factories, after the backend
    is known; safe to call repeatedly."""
    global _COMPILE_CACHE_CHECKED
    if _COMPILE_CACHE_CHECKED:
        return
    _COMPILE_CACHE_CHECKED = True
    import os

    if os.environ.get("JPX_COMPILE_CACHE", "1") in ("0", "false", ""):
        return
    try:
        import jax

        if jax.devices()[0].platform not in ("tpu", "axon"):
            return
        if jax.config.jax_compilation_cache_dir is None:
            cache_dir = os.environ.get(
                "JPX_COMPILE_CACHE_DIR",
                os.path.join(
                    os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
                    "jpeglibrary_tpu",
                    "jax-tpu",
                ),
            )
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass


from .models.decoder import DecodeResult, ImageInfo, JpegDecoder, decode, decode_rgb8
from .models.encoder import (
    JpegEncoder,
    encode_cmyk,
    encode_gray,
    encode_rgb,
    encode_rgb_stream,
    encode_rgb_stripes,
)
from .models.hierarchical import encode_hierarchical
from .models.lossless import encode_lossless
from .models.arithmetic_lossless import encode_lossless_arithmetic
from .models.optimizer import JpegOptimizer, optimize
from .models.region import decode_region
from .models.transcode import autorotate, crop, transcode, transform
from .parallel.batch import decode_batch_rgb, decode_stream_rgb, encode_batch_rgb

__all__ = [
    "JpegDecoder",
    "DecodeResult",
    "ImageInfo",
    "decode",
    "decode_rgb8",
    "decode_batch_rgb",
    "decode_region",
    "decode_stream_rgb",
    "JpegEncoder",
    "encode_batch_rgb",
    "encode_rgb",
    "encode_rgb_stream",
    "encode_rgb_stripes",
    "encode_gray",
    "encode_cmyk",
    "encode_lossless",
    "encode_lossless_arithmetic",
    "encode_hierarchical",
    "JpegOptimizer",
    "optimize",
    "autorotate",
    "crop",
    "transcode",
    "transform",
    "enable_compile_cache",
]

__version__ = "0.1.0"
