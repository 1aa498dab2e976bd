"""Pass-branching experiment: from a shared h1+uadam coarse pass, sweep the
fine-pass step scale (uadam lr tied to remesh length vs fixed) and report the
Hausdorff after each pass. Runs each branch from the SAME parent checkpoint so
differences are attributable to the branch setting alone.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from drt_tpu.data.synthetic import synthesize_capture  # noqa: E402
from drt_tpu.mesh import build_mesh_state  # noqa: E402
from drt_tpu.mesh.ply import load_ply  # noqa: E402
from drt_tpu.intersect import get_intersect_fn  # noqa: E402
from drt_tpu.optimize.loop import make_train_step, \
    default_silhouette_budget  # noqa: E402
from drt_tpu.optimize.losses import LossWeights  # noqa: E402
from drt_tpu.optimize.schedules import interp_reciprocal  # noqa: E402
from drt_tpu.remesh.isotropic import isotropic_remesh  # noqa: E402
from drt_tpu.remesh import hausdorff_distance  # noqa: E402

DATA = "/root/reference/data/"
LENS = [interp_reciprocal(10.0, 2.0, i, 4) for i in range(4)]   # quick LODs


def run_pass(cap, gv, gf, v, f, lr0, iters, optimizer, precond, lam, seed):
    ms = build_mesh_state(v, f)
    budget = default_silhouette_budget(ms.num_edges)
    w = LossWeights(ray_w=40.0, vh_w=2e-3, sm_w=0.08, ior=1.4723)
    init, step, final = make_train_step(
        get_intersect_fn("auto"), w, cap.resy, cap.resx, budget,
        optimizer=optimizer, precond=precond, precond_lambda=lam,
        cg_iters=64)
    st = init(ms)
    lr = jnp.asarray(lr0, jnp.float32)
    rng = np.random.default_rng(seed)
    for it in range(iters):
        ridx = jnp.asarray(rng.integers(0, cap.num_views, 2), jnp.int32)
        sidx = jnp.asarray(rng.integers(0, cap.num_views, 8), jnp.int32)
        st, loss, aux = step(st, lr, ms, cap.views, ridx, sidx)
    vfin = np.asarray(final(st, ms))[:ms.num_vertices]
    ffin = np.asarray(ms.faces)[:ms.num_faces]
    h = hausdorff_distance(vfin, ffin, gv, gf)
    return vfin, ffin, h


def main():
    gv, gf = load_ply(DATA + "mouse_scan.ply")
    cap = synthesize_capture(
        gv, gf, name="mouse", num_views=24, resy=240, resx=320, ior=1.4723,
        num_view_used=24,
        cache_path="results_r2/fixed_parity/capture_cache/"
                   "mouse_24v_240x320.npz")
    z = np.load("results_r2/fixed_parity/capture_cache/"
                "mouse_24v_240x320_hull160.npz")
    v, f = z["v"], z["f"]
    print("init H",
          round(hausdorff_distance(v, f, gv, gf).mean, 3), flush=True)

    # shared coarse pass: h1+uadam lr .1 (the round-2 winner)
    v0, f0 = isotropic_remesh(v, f, LENS[0])
    t0 = time.time()
    v1, f1, h = run_pass(cap, gv, gf, v0, f0, 0.1, 100, "uadam", "h1", 9.0, 0)
    print(f"pass0 len {LENS[0]:.2f} h1u lr .1: H {h.mean:.3f} "
          f"({time.time()-t0:.0f}s)", flush=True)

    # branch pass 1..3 with different lr laws
    for tag, lr_fn in (
        ("len-scaled lr .1*len/10", lambda ln: 0.1 * ln / 10.0),
        ("len-scaled lr .25*len/10", lambda ln: 0.25 * ln / 10.0),
        ("fixed lr .02", lambda ln: 0.02),
        ("parity-sgd branch", None),
    ):
        bv, bf = v1, f1
        for p in range(1, 4):
            ln = LENS[p]
            bv, bf = isotropic_remesh(bv, bf, ln)
            if lr_fn is None:
                lr = interp_reciprocal(0.1, 0.05, p, 4)
                bv, bf, h = run_pass(cap, gv, gf, bv, bf, lr, 100,
                                     "sgd", "none", 9.0, p)
            else:
                bv, bf, h = run_pass(cap, gv, gf, bv, bf, lr_fn(ln), 100,
                                     "uadam", "h1", 9.0, p)
            print(f"  [{tag}] pass{p} len {ln:.2f}: H {h.mean:.3f}",
                  flush=True)


if __name__ == "__main__":
    main()
