"""CLI surface tests: the remesh / evaluate / render subcommands as real
subprocesses (reconstruct is covered end-to-end by tests/test_h5_e2e.py).
The reference has no CLI at all — its entry is `python optim.py` with
config.py edited by hand (optim.py:221-226)."""

import os
import subprocess
import sys

import numpy as np

from drt_tpu.mesh.ply import load_ply, save_ply
from tests.meshes import make_icosphere


def _run_cli(tmp_path, *argv):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="",
               PYTHONPATH=repo + os.pathsep + os.environ.get("PYTHONPATH",
                                                             ""))
    return subprocess.run(
        [sys.executable, "-m", "drt_tpu.cli", *argv],
        env=env, cwd=str(tmp_path), text=True, capture_output=True,
        timeout=600)


def test_cli_remesh_and_evaluate(tmp_path):
    v, f = make_icosphere(subdivisions=3, radius=40.0)
    src = tmp_path / "in.ply"
    out = tmp_path / "out.ply"
    save_ply(str(src), v, f)

    r = _run_cli(tmp_path, "remesh", "--mesh", str(src), "--out", str(out),
                 "--target-len", "8")
    assert r.returncode == 0, r.stderr[-2000:]
    v2, f2 = load_ply(str(out))
    tri = v2[f2]
    mean_len = float(np.mean(np.linalg.norm(
        tri - np.roll(tri, -1, axis=1), axis=2)))
    assert 4.0 < mean_len < 12.0          # moved toward the target

    r = _run_cli(tmp_path, "evaluate", "--mesh", str(out), "--gt", str(src))
    assert r.returncode == 0, r.stderr[-2000:]
    # the remeshed sphere stays near the original surface
    line = [l for l in r.stdout.splitlines() if "mean" in l][-1]
    assert float(line.split("mean=")[1].split()[0]) < 1.0, r.stdout


def test_cli_render(tmp_path):
    v, f = make_icosphere(subdivisions=2, radius=40.0)
    src = tmp_path / "in.ply"
    save_ply(str(src), v, f)
    r = _run_cli(tmp_path, "render", "--mesh", str(src), "--res", "64",
                 "--backend", "brute", "--out-dir", str(tmp_path / "imgs"))
    assert r.returncode == 0, r.stderr[-2000:]
    imgs = os.listdir(tmp_path / "imgs")
    assert imgs, "render produced no images"
