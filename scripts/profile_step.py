"""Attribute the full-view step time to stages (VERDICT r3 next-item 1).

Times, on the real chip, for a given mesh + view:
  - the 3 oracle queries with REALISTIC ray distributions (primary rays,
    bounce-2 interior rays, exit rays) instead of 3x the primary-ray time;
  - the candidate prepass and coefficient packing alone;
  - the differentiable MT re-intersection (gather + math) alone;
  - forward loss, forward+backward step;
and prints a stage table so the untimed remainder is visible.

Usage: python scripts/profile_step.py [--mesh dog_vh] [--res 960x1280]
       [--trace /tmp/xprof]  (writes a jax.profiler trace too)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def time_it(fn, *args, n=5):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh", default="dog_vh")
    ap.add_argument("--res", default="960x1280")   # resy x resx
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--trace", default="")
    ap.add_argument("--backend", default="auto")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from drt_tpu.geometry.vec import safe_normalize
    from drt_tpu.intersect import get_intersect_fn
    from drt_tpu.mesh import build_mesh_state, load_ply
    from drt_tpu.render.trace import render_transparent, trace2
    from drt_tpu.utils import enable_compilation_cache
    from bench import make_rays

    enable_compilation_cache()
    resy, resx = map(int, args.res.split("x"))
    v, f = load_ply(f"/root/reference/data/{args.mesh}.ply")
    ms = build_mesh_state(v, f)
    intersect_fn = get_intersect_fn(args.backend)
    ior, ext = 1.4723, 1.00029
    origin, ray_dir, screen_point = make_rays(v, resy, resx)
    n = origin.shape[0]
    report = {"mesh": args.mesh, "rays": int(n),
              "faces": int(ms.num_faces)}

    def loss_fn(vertices):
        m = ms.with_vertices(vertices)
        res = render_transparent(origin, ray_dir, m, intersect_fn, ior, ext)
        target = safe_normalize(screen_point - res.origin)
        diff = res.direction - target
        return jnp.sum(jnp.where(res.valid[:, None], diff * diff, 0.0))

    # Realistic per-bounce ray populations (materialized once, stop-grad).
    @jax.jit
    def bounce_rays(vertices):
        m = ms.with_vertices(vertices)
        o2, d2, active, _, _ = trace2(origin, ray_dir, m, intersect_fn,
                                      ior, ext)
        return o2, d2

    o_exit, d_exit = jax.block_until_ready(bounce_rays(ms.vertices))

    @jax.jit
    def bounce1_rays(vertices):
        m = ms.with_vertices(vertices)
        from drt_tpu.render.trace import _bounce
        act = jnp.ones(origin.shape[:-1], bool)
        o1, d1, a1, _ = _bounce(origin, ray_dir, act, m, intersect_fn,
                                ior, ext, 1e-5)
        return o1, d1

    o_b2, d_b2 = jax.block_until_ready(bounce1_rays(ms.vertices))

    oracle = jax.jit(lambda o, d: intersect_fn(o, d, ms.vertices, ms.faces,
                                               ms.face_valid).t)
    report["oracle_primary_ms"] = round(
        1e3 * time_it(oracle, origin, ray_dir, n=args.iters), 2)
    report["oracle_bounce2_ms"] = round(
        1e3 * time_it(oracle, o_b2, d_b2, n=args.iters), 2)
    report["oracle_exit_ms"] = round(
        1e3 * time_it(oracle, o_exit, d_exit, n=args.iters), 2)

    # candidate prepass + coef packing (per oracle query)
    from drt_tpu.intersect.culled import _chunk_aabbs
    from drt_tpu.intersect import pallas_kernel as pk
    tuned = pk.tuned_params(int(ms.faces.shape[0]))
    ray_tile = tuned.get("ray_tile", pk.RAY_TILE)
    tri_chunk = tuned.get("tri_chunk", pk.TRI_CHUNK)
    prepass_kind = tuned.get("prepass", "ray")
    report["tuned"] = {"ray_tile": ray_tile, "tri_chunk": tri_chunk,
                       "prepass": prepass_kind}

    def prep(o, d, vert):
        shift = jax.lax.stop_gradient(jnp.mean(o.astype(jnp.float32), 0))
        oc = o.astype(jnp.float32) - shift
        dc = d.astype(jnp.float32)
        pad = (-oc.shape[0]) % ray_tile
        if pad:
            oc = jnp.pad(oc, ((0, pad), (0, 0)))
            dc = jnp.pad(dc, ((0, pad), (0, 0)), constant_values=1.0)
        T = oc.shape[0] // ray_tile
        ot = oc.reshape(T, ray_tile, 3).transpose(0, 2, 1)
        dt = dc.reshape(T, ray_tile, 3).transpose(0, 2, 1)
        lo_c, hi_c, cv = _chunk_aabbs(vert, ms.faces, ms.face_valid, shift,
                                      tri_chunk)
        if prepass_kind == "tile":
            return pk._candidates_tile(ot, dt, lo_c, hi_c, cv, 0.0)
        return pk._candidates(ot, dt, lo_c, hi_c, cv, 0.0)

    jp = jax.jit(prep)
    report["prepass_primary_ms"] = round(
        1e3 * time_it(jp, origin, ray_dir, ms.vertices, n=args.iters), 2)
    report["prepass_bounce2_ms"] = round(
        1e3 * time_it(jp, o_b2, d_b2, ms.vertices, n=args.iters), 2)
    report["prepass_exit_ms"] = round(
        1e3 * time_it(jp, o_exit, d_exit, ms.vertices, n=args.iters), 2)

    # candidate volume per population (kernel work scales with it)
    for tag, (oo, dd) in {"primary": (origin, ray_dir),
                          "bounce2": (o_b2, d_b2),
                          "exit": (o_exit, d_exit)}.items():
        _, counts = jp(oo, dd, ms.vertices)
        import numpy as np
        report[f"cand_sum_{tag}"] = int(np.asarray(counts).sum())

    def coef_only(vert):
        shift = jnp.zeros((3,), jnp.float32)
        return pk._coef_packed(vert, ms.faces, ms.face_valid, shift,
                               tri_chunk)[0]

    report["coef_pack_ms"] = round(
        1e3 * time_it(jax.jit(coef_only), ms.vertices, n=args.iters), 2)

    # differentiable MT re-intersection alone (gather + math, no oracle):
    hits = jax.jit(lambda o, d: intersect_fn(
        o, d, ms.vertices, ms.faces, ms.face_valid))(origin, ray_dir)
    safe_id = jax.block_until_ready(jnp.where(hits.hit, hits.tri_id, 0))

    def mt_re(vertices):
        from drt_tpu.geometry.mt import moller_trumbore
        tri = vertices[ms.faces[safe_id]]
        u, vv, t, nn = moller_trumbore(origin, ray_dir, tri)
        return jnp.sum(t) + jnp.sum(nn)

    report["mt_reintersect_fwd_ms"] = round(
        1e3 * time_it(jax.jit(mt_re), ms.vertices, n=args.iters), 2)
    report["mt_reintersect_bwd_ms"] = round(
        1e3 * time_it(jax.jit(jax.grad(mt_re)), ms.vertices, n=args.iters), 2)

    report["fwd_ms"] = round(
        1e3 * time_it(jax.jit(loss_fn), ms.vertices, n=args.iters), 2)
    step = jax.jit(jax.grad(loss_fn))
    report["step_ms"] = round(
        1e3 * time_it(step, ms.vertices, n=args.iters), 2)

    acc = (report["oracle_primary_ms"] + report["oracle_bounce2_ms"]
           + report["oracle_exit_ms"] + 2 * report["mt_reintersect_fwd_ms"])
    report["fwd_unattributed_ms"] = round(report["fwd_ms"] - acc, 2)

    if args.trace:
        from drt_tpu.utils.metrics import profile_trace
        with profile_trace(args.trace):
            for _ in range(3):
                jax.block_until_ready(step(ms.vertices))

    import json
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
