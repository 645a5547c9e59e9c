"""Multi-process (multi-"host") distributed execution test.

SURVEY.md §4.5 calls for emulating multi-node with jax.distributed
multi-process runs and asserting bit-exact equality of sharded vs
single-device execution — this does exactly that: two local processes,
each with 2 virtual CPU devices, form a 4-device global mesh and run
the sharded full pipeline step; every process checks its addressable
output shards against the locally computed single-device reference.
"""

import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid = int(sys.argv[1]); port = sys.argv[2]
    sys.path.insert(0, "/root/repo")
    from jpeglibrary_tpu.parallel import distributed
    distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2 and len(jax.devices()) == 4

    import numpy as np
    from jpeglibrary_tpu.parallel.sharding import full_step, make_sharded_full_step
    from jpeglibrary_tpu.parallel.distributed import make_global_mesh
    from jpeglibrary_tpu.syntax.quantization import (
        STANDARD_CHROMINANCE_ZIGZAG, STANDARD_LUMINANCE_ZIGZAG,
    )

    rng = np.random.default_rng(123)
    y = rng.integers(-128, 128, size=(4, 8, 16, 64), dtype=np.int16)
    cb = rng.integers(-64, 64, size=(4, 4, 8, 64), dtype=np.int16)
    cr = rng.integers(-64, 64, size=(4, 4, 8, 64), dtype=np.int16)
    qt_l = STANDARD_LUMINANCE_ZIGZAG.astype(np.int32)
    qt_c = STANDARD_CHROMINANCE_ZIGZAG.astype(np.int32)

    # single-device reference, computed locally in each process
    ref_rgb, ref_requant, ref_hist = jax.jit(full_step)(y, cb, cr, qt_l, qt_c)
    ref_rgb = np.asarray(ref_rgb)

    mesh = make_global_mesh(stripe=2)
    step = make_sharded_full_step(mesh)
    # Multi-process: host-local numpy must become global jax.Arrays
    # (inputs are identical on every process).
    from jax.sharding import NamedSharding, PartitionSpec as P

    img = NamedSharding(mesh, P("data", "stripe"))
    rep = NamedSharding(mesh, P())
    mk = lambda a, s: jax.make_array_from_callback(a.shape, s, lambda idx: a[idx])
    rgb, requant, hist = step(
        mk(y, img), mk(cb, img), mk(cr, img), mk(qt_l, rep), mk(qt_c, rep)
    )
    jax.block_until_ready((rgb, requant, hist))

    for shard in rgb.addressable_shards:
        got = np.asarray(shard.data)
        expect = ref_rgb[tuple(shard.index)]
        np.testing.assert_array_equal(got, expect)
    np.testing.assert_array_equal(np.asarray(hist.addressable_shards[0].data),
                                  np.asarray(ref_hist))
    assert list(distributed.local_batch_indices(5)) == list(range(pid, 5, 2))
    print(f"proc {pid} OK", flush=True)
    """
)


def test_two_process_sharded_step_matches_single_device():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(i), str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outputs = []
    for i, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            pytest.fail(f"distributed worker {i} timed out")
        outputs.append((p.returncode, out))
    for i, (rc, out) in enumerate(outputs):
        assert rc == 0, f"worker {i} failed:\n{out[-2000:]}"
        assert f"proc {i} OK" in out
