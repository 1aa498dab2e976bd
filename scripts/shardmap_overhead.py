"""Single-chip shard_map overhead (VERDICT r4 stretch item 10).

The multi-chip claim rests on dryrun compiles; this measures the one
constant factor measurable on a single chip: the same train step built
plain vs through make_sharded_train_step on a 1-device mesh (shard_mapped
oracle, NamedSharding-placed data, GSPMD partitioning active). The ratio is
the sharding-machinery overhead a real slice would start from.

Writes reports/shardmap_overhead.json.
Usage: python scripts/shardmap_overhead.py [--iters 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA = "/root/reference/data/"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--out", default="reports/shardmap_overhead.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from drt_tpu.config import HyperParams
    from drt_tpu.data import synthesize_capture
    from drt_tpu.intersect import get_intersect_fn
    from drt_tpu.mesh import build_mesh_state, load_ply
    from drt_tpu.optimize.loop import make_train_step
    from drt_tpu.optimize.losses import LossWeights
    from drt_tpu.parallel import make_ray_mesh, replicate, shard_views
    from drt_tpu.parallel.sharding import make_sharded_train_step
    from drt_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    resy, resx = 960, 1280                       # full Pointgray view
    gt_v, gt_f = load_ply(DATA + "mouse_scan.ply")
    cap = synthesize_capture(gt_v, gt_f, name="mouse", num_views=2,
                             resy=resy, resx=resx, ior=1.4723,
                             num_view_used=2,
                             cache_path="result/capture_cache/"
                                        f"mouse_2v_{resy}x{resx}.npz")
    v0, f0 = load_ply(DATA + "mouse_vh.ply")
    ms = build_mesh_state(v0, f0)

    hp = HyperParams()
    weights = LossWeights(ray_w=hp.ray_w, vh_w=hp.vh_w, sm_w=hp.sm_w,
                          ior=hp.ior, ext_ior=hp.ext_ior)
    kwargs = dict(intersect_fn=get_intersect_fn("auto"), weights=weights,
                  resy=resy, resx=resx, silhouette_budget=4096,
                  momentum=hp.momentum)
    lr = jnp.asarray(0.1, jnp.float32)
    ray_idx = jnp.asarray(0, jnp.int32)
    silh_idx = jnp.asarray([0, 1] * 4, jnp.int32)

    def time_step(step, state, mesh_state, views, n):
        s, loss, _ = step(state, lr, mesh_state, views, ray_idx, silh_idx)
        jax.block_until_ready(loss)
        s, loss, _ = step(state, lr, mesh_state, views, ray_idx, silh_idx)
        jax.block_until_ready(loss)
        t0 = time.perf_counter()
        for _ in range(n):
            s, loss, _ = step(state, lr, mesh_state, views, ray_idx,
                              silh_idx)
        jax.block_until_ready(loss)
        return (time.perf_counter() - t0) / n, float(loss)

    # plain step
    init_state, step, _ = make_train_step(**kwargs)
    state = init_state(ms)
    dt_plain, loss_plain = time_step(step, state, ms, cap.views, args.iters)

    # 1-device mesh, full sharding machinery
    mesh = make_ray_mesh(jax.devices()[:1])
    (init_s, step_s, _), ms_s, views_s = make_sharded_train_step(
        kwargs, mesh, ms, cap.views)
    state_s = replicate(mesh, init_s(ms_s))
    dt_shard, loss_shard = time_step(step_s, state_s, ms_s, views_s,
                                     args.iters)

    row = {
        "device": jax.devices()[0].device_kind,
        "workload": f"mouse full view {resx}x{resy}, full train step",
        "step_ms_plain": round(dt_plain * 1e3, 2),
        "step_ms_sharded_1dev": round(dt_shard * 1e3, 2),
        "overhead_pct": round(100 * (dt_shard / dt_plain - 1), 1),
        "loss_match": abs(loss_plain - loss_shard)
        <= 1e-4 * max(1.0, abs(loss_plain)),
    }
    print(json.dumps(row), flush=True)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    json.dump(row, open(args.out, "w"), indent=1)


if __name__ == "__main__":
    main()
