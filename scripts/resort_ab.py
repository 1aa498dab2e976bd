"""A/B the incoherent-query strategy (VERDICT r4 next-item 2).

For each mesh regime, time the full differentiable step (3 oracle queries,
MT chain, loss, backward) with the pallas backend under both incoherent
strategies:
  - "ray":    exact per-ray candidate prepass for bounce-2/exit queries
              (O(N*NC) slab tests — the round-4 default)
  - "resort": Morton re-sort the rays so the tile-frustum prepass applies
              (intersect/resort.py), then scatter hits back

Writes reports/resort_ab.json rows {faces_padded, winner, step_ms_ray,
step_ms_resort, fwd_ms_ray, fwd_ms_resort}; intersect.api._auto_incoherent
picks the nearest regime's winner at oracle-build time, so committing the
report IS the rollout.

Usage: python scripts/resort_ab.py [--iters 5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA = "/root/reference/data/"

CONFIGS = [
    # (name, ply, resy, resx) — full capture views, both kernel regimes
    ("mouse_vh", DATA + "mouse_vh.ply", 960, 1280),     # VMEM-resident
    ("dog_vh", DATA + "dog_vh.ply", 960, 1280),         # HBM-streaming
    ("monkey_vh", DATA + "monkey_vh.ply", 256, 256),    # streaming, small N
    ("tiger_vh", DATA + "tiger_vh.ply", 1080, 1920),    # streaming, Redmi
]


def time_it(fn, *args, n=5):
    """Per-call blocking: async dispatch with one trailing block can report
    dispatch time, not execution (observed: a 65k-ray step 'measured' at
    0.04 ms). Blocking each call costs ~us at these ms scales."""
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / n


def run_config(name, ply, resy, resx, iters):
    import jax
    import jax.numpy as jnp
    from bench import make_rays
    from drt_tpu.geometry.vec import safe_normalize
    from drt_tpu.intersect import get_intersect_fn
    from drt_tpu.mesh import build_mesh_state, load_ply
    from drt_tpu.render import render_transparent
    from drt_tpu.render.chunked import auto_ray_chunk, chunked_sum

    v, f = load_ply(ply)
    ms = build_mesh_state(v, f)
    origin, ray_dir, screen_point = make_rays(v, resy, resx)
    n_rays = origin.shape[0]
    ray_chunk = auto_ray_chunk(n_rays)
    lane_valid = jnp.ones((n_rays,), bool)

    row = {"mesh": name, "faces_padded": int(ms.faces.shape[0]),
           "rays": int(n_rays), "res": f"{resx}x{resy}"}
    for strat in ("ray", "resort"):
        intersect_fn = get_intersect_fn("pallas", incoherent=strat)

        def loss_fn(vertices):
            m = ms.with_vertices(vertices)

            def body(o, d, lv):
                res = render_transparent(o, d, m, intersect_fn, 1.4723,
                                         1.00029, lane_mask=lv)
                target = safe_normalize(screen_point - res.origin)
                diff = res.direction - target
                return jnp.sum(jnp.where(res.valid[:, None],
                                         diff * diff, 0.0))

            return chunked_sum(body, (origin, ray_dir, lane_valid),
                               ray_chunk, pad_values=(0.0, 1.0, False))

        dt_fwd = time_it(jax.jit(loss_fn), ms.vertices, n=iters)
        dt_step = time_it(jax.jit(jax.grad(loss_fn)), ms.vertices, n=iters)
        row[f"fwd_ms_{strat}"] = round(dt_fwd * 1e3, 2)
        row[f"step_ms_{strat}"] = round(dt_step * 1e3, 2)
        # hit parity between strategies on a ray subsample (exactness)
        if strat == "resort":
            stride = max(1, n_rays // 4096)
            o_s, d_s = origin[::stride], ray_dir[::stride]
            h_ray = get_intersect_fn("pallas", incoherent="ray")(
                o_s, d_s, ms.vertices, ms.faces, ms.face_valid,
                coherent=False)
            h_rs = intersect_fn(o_s, d_s, ms.vertices, ms.faces,
                                ms.face_valid, coherent=False)
            import numpy as np
            row["hit_mismatch_resort_vs_ray"] = int(
                (np.asarray(h_ray.hit) != np.asarray(h_rs.hit)).sum())
    # Plausibility guard (tune_kernel's 1000 Mrays/s rule): a step timing
    # implying >1000 Mrays/s is a dispatch artifact, not a measurement —
    # never let it pick the winner.
    for strat in ("ray", "resort"):
        ms = row[f"step_ms_{strat}"]
        if ms > 0 and n_rays / (ms * 1e-3) > 1e9:
            row[f"step_ms_{strat}_artifact"] = ms
            row[f"step_ms_{strat}"] = float("inf")
    if row["step_ms_ray"] == float("inf") \
            and row["step_ms_resort"] == float("inf"):
        row["winner"] = "ray"                    # no valid measurement
    else:
        row["winner"] = ("resort"
                         if row["step_ms_resort"] < row["step_ms_ray"]
                         else "ray")
    print(json.dumps(row), flush=True)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--out", default="reports/resort_ab.json")
    ap.add_argument("--configs", nargs="*", default=None)
    args = ap.parse_args()

    from drt_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    rows = []
    if os.path.exists(args.out):
        rows = json.load(open(args.out))
    for cfg in CONFIGS:
        if args.configs and cfg[0] not in args.configs:
            continue
        try:
            row = run_config(*cfg, args.iters)
        except Exception as e:
            print(f"FAILED {cfg[0]}: {e!r}", file=sys.stderr)
            continue
        rows = [r for r in rows if r.get("mesh") != row["mesh"]] + [row]
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        json.dump(rows, open(args.out, "w"), indent=1)


if __name__ == "__main__":
    main()
