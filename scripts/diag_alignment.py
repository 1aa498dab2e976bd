"""Diagnostic: from the (carved) hull init, is the full-batch gradient of
each loss term descent-aligned with the TRUE displacement toward the scan?
And does the loss actually decrease along that true displacement path?

If -grad aligns with (closest scan point - vertex) and loss(v + a*disp)
decreases in a, the data/loss are sound and the optimizer is at fault;
otherwise the loss landscape itself fights convergence at hull distance and
no optimizer tuning will fix the quick-suite degradation.

Usage: python scripts/diag_alignment.py [--object mouse] [--res-div 4]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--object", default="mouse")
    ap.add_argument("--views", type=int, default=24)
    ap.add_argument("--capture-cache", default=None)
    ap.add_argument("--hull-cache", default=None)
    ap.add_argument("--remesh-len", type=float, default=10.0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from drt_tpu.config import HyperParams
    from drt_tpu.data.views import CaptureData, stack_views
    from drt_tpu.intersect import get_intersect_fn
    from drt_tpu.mesh import build_mesh_state, load_ply
    from drt_tpu.optimize.losses import LossWeights, total_loss
    from drt_tpu.remesh import isotropic_remesh
    from drt_tpu.remesh.surface import SurfaceIndex

    name = args.object
    cache = args.capture_cache or \
        f"result_suite/capture_cache/{name}_24v_240x320.npz"
    z = np.load(cache)
    views = [dict(screen_pixel=z[f"sp{i}"], valid=z[f"va{i}"],
                  mask=z[f"mk{i}"], origin=z[f"or{i}"], ray_dir=z[f"rd{i}"],
                  R=z[f"R{i}"], K=z[f"K{i}"])
             for i in range(int(z["num_views"]))]
    cap = CaptureData(name=name, resy=int(z["resy"]), resx=int(z["resx"]),
                      num_views=int(z["num_views"]), views=stack_views(views))

    hull_cache = args.hull_cache or \
        f"results_r2/quick_C_parity_sgd_carved/capture_cache/{name}_24v_240x320_hull160.npz"
    hz = np.load(hull_cache)
    v0, f0 = hz["v"], hz["f"]
    v0, f0 = isotropic_remesh(v0, f0, args.remesh_len)
    ms = build_mesh_state(v0, f0)
    gt_v, gt_f = load_ply(f"/root/reference/data/{name}_scan.ply")

    # true displacement: vertex -> closest point on the scan surface
    pts, dist = SurfaceIndex(gt_v, gt_f).closest_points(
        np.asarray(ms.vertices[: ms.num_vertices], np.float64))
    disp = np.zeros(ms.vertices.shape)
    disp[: ms.num_vertices] = pts - np.asarray(
        ms.vertices[: ms.num_vertices])
    disp_j = jnp.asarray(disp, jnp.float32)
    print(f"{name}: V={ms.num_vertices} init mean |disp|="
          f"{np.linalg.norm(disp[:ms.num_vertices], axis=1).mean():.3f}")

    hp = HyperParams(name=name)
    intersect_fn = get_intersect_fn("auto")
    all_views = jnp.arange(cap.num_views, dtype=jnp.int32)

    def term_loss(which):
        w = LossWeights(
            ray_w=hp.ray_w if which in ("ray", "all") else 0.0,
            vh_w=hp.vh_w if which in ("vh", "all") else 0.0,
            sm_w=hp.sm_w if which in ("sm", "all") else 0.0,
            ior=1.4723, ext_ior=hp.ext_ior)

        @jax.jit
        def f(vertices):
            m = ms.with_vertices(vertices)
            loss, _aux = total_loss(
                m, cap.views, all_views, all_views, intersect_fn, w,
                cap.resy, cap.resx, silhouette_budget=2048)
            return loss
        return f

    report = {}
    for which in ("ray", "vh", "sm", "all"):
        f = term_loss(which)
        g = jax.grad(f)(ms.vertices)
        g = np.asarray(g)[: ms.num_vertices]
        d = disp[: ms.num_vertices]
        valid = np.linalg.norm(g, axis=1) > 0
        cos_global = float(
            -np.sum(g * d) / (np.linalg.norm(g) * np.linalg.norm(d) + 1e-30))
        per = -np.sum(g[valid] * d[valid], axis=1) / (
            np.linalg.norm(g[valid], axis=1)
            * np.linalg.norm(d[valid], axis=1) + 1e-30)
        line = {}
        for a in (0.0, 0.25, 0.5, 0.75, 1.0):
            line[a] = float(f(ms.vertices + a * disp_j))
        report[which] = {
            "cos_global": round(cos_global, 4),
            "cos_median": round(float(np.median(per)), 4),
            "frac_descent": round(float((per > 0).mean()), 4),
            "n_nonzero_grad": int(valid.sum()),
            "loss_along_true_path": {str(k): round(v, 4)
                                     for k, v in line.items()},
        }
        print(which, json.dumps(report[which]))

    os.makedirs("reports", exist_ok=True)
    with open(f"reports/diag_alignment_{name}.json", "w") as fh:
        json.dump(report, fh, indent=1)


if __name__ == "__main__":
    main()
