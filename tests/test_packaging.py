"""Library packaging (the reference ships as a consumable NuGet
package; pyproject.toml is the pip-installable equivalent): `pip
install -e .` into a FRESH venv must make the package importable and
the jpx-* console scripts runnable from outside the checkout. The
image has zero egress, so the install runs --no-build-isolation with
the current environment's site-packages on PYTHONPATH for
setuptools/numpy (no third-party package is downloaded or installed)."""

import os
import pathlib
import subprocess
import sys

import numpy as np
import pytest

REPO = str(pathlib.Path(__file__).resolve().parent.parent)
ASSET = "/root/reference/tests/Assets/baseline/lake.jpg"


@pytest.fixture(scope="module")
def venv(tmp_path_factory):
    if not os.path.exists(ASSET):
        pytest.skip("reference assets unavailable")
    vdir = tmp_path_factory.mktemp("pkg") / "venv"
    subprocess.run([sys.executable, "-m", "venv", str(vdir)], check=True)
    sp = os.path.dirname(os.path.dirname(np.__file__))
    env = dict(os.environ, PYTHONPATH=sp)
    r = subprocess.run(
        [str(vdir / "bin" / "pip"), "install", "-q", "-e", REPO,
         "--no-deps", "--no-build-isolation"],
        env=env, capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    return vdir, env


def test_installed_import_and_decode(venv):
    vdir, env = venv
    r = subprocess.run(
        [str(vdir / "bin" / "python"), "-c",
         "import jpeglibrary_tpu as jt;"
         f"d = open({ASSET!r}, 'rb').read();"
         "res = jt.decode(d);"
         "print(res.width, res.height)"],
        env=env, capture_output=True, text=True, timeout=300, cwd="/tmp",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert r.stdout.strip() == "1024 768"


def test_console_script_decode(venv, tmp_path):
    vdir, env = venv
    out = tmp_path / "lake.png"
    r = subprocess.run(
        [str(vdir / "bin" / "jpx-decode"), ASSET, str(out)],
        env=dict(env, JAX_PLATFORMS="cpu"),
        capture_output=True, text=True, timeout=300, cwd="/tmp",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert out.exists() and out.stat().st_size > 1000
