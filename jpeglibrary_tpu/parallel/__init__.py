"""Multi-device sharding for the TPU JPEG engine.

The reference library is strictly single-threaded (SURVEY.md §2.4); this
package is where the new framework's first-class parallelism lives:

- image-batch data parallelism (mesh axis ``data``)
- MCU-row stripe parallelism for the transform stages (axis ``stripe``)
- restart-segment parallel entropy decode (host prepass + per-segment
  scanners)
- global histogram reduction (psum) for encoder/optimizer table building
"""

from .sharding import make_mesh, batched_transform_rgb, full_step
from .batch import decode_batch_rgb, decode_stream_rgb, encode_batch_rgb
from .distributed import decode_batch_rgb_global, local_batch_block

__all__ = [
    "make_mesh",
    "batched_transform_rgb",
    "full_step",
    "decode_batch_rgb",
    "decode_batch_rgb_global",
    "local_batch_block",
    "decode_stream_rgb",
    "encode_batch_rgb",
]
