"""Multi-host scaling hooks.

The reference is single-process (SURVEY.md §2.4); this framework scales
across hosts with jax.distributed + the same mesh programs:

- each host entropy-decodes its shard of the image batch locally (the
  host stages are embarrassingly parallel across images),
- the sharded device programs (`parallel.sharding.make_sharded_full_step`,
  batched transforms) run SPMD over the global mesh, with the only
  cross-host traffic being the encoder/optimizer histogram all-reduce
  (a 17-element psum) — DCN-negligible,
- batch-to-host assignment follows `jax.process_index()`.

There is no multi-host hardware in this environment; the mesh program
itself is validated on N virtual devices (tests/test_parallel.py and
the driver's multi-chip dry run).
"""

from __future__ import annotations

from typing import Optional, Sequence


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed (no-op for single-process runs)."""
    import jax

    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_global_mesh(*, stripe: int = 1):
    """A ('data', 'stripe') mesh over all devices of all processes."""
    from .sharding import make_mesh

    return make_mesh(None, stripe=stripe)


def local_batch_indices(n_images: int) -> Sequence[int]:
    """The slice of a global image batch this host should scan: images
    are striped over processes so every host's entropy-decode load is
    balanced regardless of per-image cost."""
    import jax

    return range(jax.process_index(), n_images, jax.process_count())
