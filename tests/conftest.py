"""Test configuration: force a virtual 8-device CPU mesh.

Multi-chip sharding is tested on virtual CPU devices
(xla_force_host_platform_device_count), per the project test strategy
(SURVEY.md §4.5): real TPU hardware is single-chip here, and CPU runs
are also far faster for the many small test workloads.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pathlib

import pytest

ASSETS = pathlib.Path("/root/reference/tests/Assets")


@pytest.fixture(scope="session")
def assets_dir() -> pathlib.Path:
    if not ASSETS.is_dir():
        pytest.skip("reference asset directory unavailable")
    return ASSETS
