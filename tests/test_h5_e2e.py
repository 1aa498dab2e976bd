"""End-to-end reconstruction through the reference-schema h5 path
(VERDICT r3 missing #2): synthesize a capture, write it with the exact
reference schema (captured_data.py:99-108), and drive the REAL CLI surface
`python -m drt_tpu.cli reconstruct --data file.h5` in a subprocess — the
loader (load_h5_capture), carve init, optimizer, remesher, and PLY export
all exercised end-to-end from the file format a reference user would bring.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from drt_tpu.data import synthesize_capture
from drt_tpu.data.captured import load_h5_capture, save_h5_capture
from tests.meshes import make_icosphere


def test_h5_infers_views_and_resolution(tmp_path):
    """num_views and resy/resx default to what the file contains."""
    gt_v, gt_f = make_icosphere(subdivisions=2, radius=50.0)
    cap = synthesize_capture(gt_v, gt_f, name="mouse", num_views=3,
                             resy=24, resx=40, ior=1.5, backend="brute",
                             num_view_used=3)
    path = str(tmp_path / "m.h5")
    save_h5_capture(cap, path)
    back = load_h5_capture(path, "mouse")     # no counts, no resolution
    assert back.num_views == 3
    assert (back.resy, back.resx) == (24, 40)
    assert back.num_view_used == 3            # clamped to the file


def test_cli_reconstruct_from_h5(tmp_path):
    gt_v, gt_f = make_icosphere(subdivisions=3, radius=50.0)
    from drt_tpu.mesh import save_ply
    save_ply(str(tmp_path / "gt.ply"), gt_v, gt_f)

    cap = synthesize_capture(gt_v, gt_f, name="mouse", num_views=8,
                             resy=48, resx=64, ior=1.4723, backend="brute",
                             num_view_used=8)
    h5_path = str(tmp_path / "mouse.h5")
    save_h5_capture(cap, h5_path)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="",
               PYTHONPATH=repo + os.pathsep + os.environ.get("PYTHONPATH", ""))
    out = subprocess.run(
        [sys.executable, "-m", "drt_tpu.cli", "reconstruct",
         "--name", "mouse", "--data", h5_path,
         "--init", "carved", "--carve-res", "48",
         "--passes", "2", "--iters", "40", "--backend", "brute",
         "--start-len", "8", "--end-len", "5",
         "--result-dir", str(tmp_path)],
        env=env, cwd=str(tmp_path), capture_output=True, text=True,
        timeout=1200)
    assert out.returncode == 0, out.stderr[-2000:]

    recons = tmp_path / "mouse_recons.ply"
    assert recons.exists()
    from drt_tpu.mesh import load_ply
    from drt_tpu.remesh import hausdorff_distance
    v, f = load_ply(str(recons))
    h = hausdorff_distance(v, f, gt_v, gt_f)
    # Carve at 48^3 over the working volume leaves ~unit-scale voxels; the
    # short schedule must land within a few units of the radius-50 sphere.
    assert h.mean < 5.0, f"H.mean={h.mean}"
