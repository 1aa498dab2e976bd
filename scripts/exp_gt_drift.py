"""Equilibrium/bias probe: start AT the ground truth (remeshed to the pass
edge length), run the optimizer with no remeshing, and watch the Hausdorff.
If the mesh drifts off GT, the loss landscape's minimum is displaced (bias)
or the optimizer noise floor exceeds the measurement — either way this is
the reconstruction ceiling, measured directly.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from drt_tpu.data.synthetic import synthesize_capture  # noqa: E402
from drt_tpu.mesh import build_mesh_state  # noqa: E402
from drt_tpu.mesh.ply import load_ply  # noqa: E402
from drt_tpu.intersect import get_intersect_fn  # noqa: E402
from drt_tpu.optimize.loop import make_train_step, \
    default_silhouette_budget  # noqa: E402
from drt_tpu.optimize.losses import LossWeights  # noqa: E402
from drt_tpu.remesh.isotropic import isotropic_remesh  # noqa: E402
from drt_tpu.remesh import hausdorff_distance  # noqa: E402

DATA = "/root/reference/data/"


def main():
    gv, gf = load_ply(DATA + "mouse_scan.ply")
    cap = synthesize_capture(
        gv, gf, name="mouse", num_views=24, resy=240, resx=320, ior=1.4723,
        num_view_used=24,
        cache_path="results_r2/fixed_parity/capture_cache/"
                   "mouse_24v_240x320.npz")
    v0, f0 = isotropic_remesh(gv, gf, 2.0)
    h0 = hausdorff_distance(v0, f0, gv, gf)
    print(f"GT remeshed to len 2: H {h0.mean:.4f} V {len(v0)}", flush=True)
    ms = build_mesh_state(v0, f0)
    budget = default_silhouette_budget(ms.num_edges)
    w = LossWeights(ray_w=40.0, vh_w=2e-3, sm_w=0.08, ior=1.4723)
    fn = get_intersect_fn("auto")

    for tag, opt, precond, lr0 in (
        ("parity sgd lr.1", "sgd", "none", 0.1),
        ("parity sgd lr.05", "sgd", "none", 0.05),
        ("h1u lr.02", "uadam", "h1", 0.02),
    ):
        init, step, final = make_train_step(fn, w, 240, 320, budget,
                                            optimizer=opt, precond=precond,
                                            precond_lambda=9.0, cg_iters=64)
        st = init(ms)
        lr = jnp.asarray(lr0, jnp.float32)
        rng = np.random.default_rng(7)
        for it in range(201):
            ridx = jnp.asarray(rng.integers(0, 24, 2), jnp.int32)
            sidx = jnp.asarray(rng.integers(0, 24, 8), jnp.int32)
            st, loss, aux = step(st, lr, ms, cap.views, ridx, sidx)
            if it % 50 == 0:
                vfin = np.asarray(final(st, ms))[:ms.num_vertices]
                h = hausdorff_distance(vfin, np.asarray(ms.faces)[:ms.num_faces],
                                       gv, gf)
                print(f"  [{tag}] iter {it}: H {h.mean:.4f} "
                      f"loss {float(loss):.3f} ray {float(aux['ray']):.2f} "
                      f"maxgrad {float(aux['max_grad']):.3f}", flush=True)


if __name__ == "__main__":
    main()
