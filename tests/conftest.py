"""Test configuration: force a virtual 8-device CPU mesh.

Multi-chip sharding is tested on virtual CPU devices
(xla_force_host_platform_device_count), per the project test strategy
(SURVEY.md §4.5): real TPU hardware is single-chip here, and CPU runs
are also far faster for the many small test workloads.
"""

import os

# Force CPU: the image pre-sets JAX_PLATFORMS=axon (the TPU tunnel), so
# this must be an overwrite, not a setdefault, and must also go through
# jax.config (the axon plugin wins over the env var otherwise).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

ASSETS = pathlib.Path("/root/reference/tests/Assets")


@pytest.fixture(scope="session")
def assets_dir() -> pathlib.Path:
    if not ASSETS.is_dir():
        pytest.skip("reference asset directory unavailable")
    return ASSETS
