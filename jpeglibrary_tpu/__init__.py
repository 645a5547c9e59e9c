"""jpeglibrary_tpu — a TPU-native JPEG codec framework.

A from-scratch re-design of the capability matrix of
yigolden/JpegLibrary (the reference C# library mounted at
/root/reference) for JAX/XLA/Pallas on TPU:

- decode: baseline (SOF0/1), progressive (SOF2), lossless (SOF3),
  arithmetic sequential/progressive (SOF9/10)
- encode: baseline SOF0 with standard / optimized (package-merge)
  Huffman tables
- optimize: lossless Huffman re-optimization transcoding
- batched, sharded multi-image pipelines over jax.sharding meshes

Architecture: host container parsing -> entropy decode (native C++
scanner / restart-segment parallel) -> batched device transform kernels
(dequant + IDCT + upsample + color) -> output formatting.
"""

from .models.decoder import DecodeResult, ImageInfo, JpegDecoder, decode

__all__ = [
    "JpegDecoder",
    "DecodeResult",
    "ImageInfo",
    "decode",
]

__version__ = "0.1.0"
