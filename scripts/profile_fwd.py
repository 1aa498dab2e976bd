"""Stage-by-stage decomposition of the differentiable step (VERDICT r3
weak #1: "fwd_ms has never been profiled op-by-op").

Times jitted prefixes of the pipeline so each stage's marginal cost is the
difference of consecutive rows, plus isolated micro-stages (the AoS triangle
gather, MT alone, refract alone) and the SoA variant for comparison.

    python scripts/profile_fwd.py [--mesh mouse_vh] [--resy 960 --resx 1280]

Run on an otherwise-idle chip (timings, unlike per-op profiler traces, are
distorted by concurrent TPU processes).
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA = "/root/reference/data/"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh", default="mouse_vh")
    ap.add_argument("--resy", type=int, default=960)
    ap.add_argument("--resx", type=int, default=1280)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--out", default="reports/profile_fwd.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from bench import make_rays
    from drt_tpu.geometry.mt import moller_trumbore
    from drt_tpu.geometry.vec import safe_normalize
    from drt_tpu.intersect import get_intersect_fn
    from drt_tpu.mesh import build_mesh_state, load_ply
    from drt_tpu.render.trace import refract_ray, render_transparent, trace2
    from drt_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    path = args.mesh if os.path.exists(args.mesh) else DATA + args.mesh + ".ply"
    v, f = load_ply(path)
    ms = build_mesh_state(v, f)
    ifn = get_intersect_fn("auto")
    ior, ext_ior = 1.4723, 1.00029
    origin, ray_dir, screen_point = make_rays(v, args.resy, args.resx)
    n = origin.shape[0]

    def time_it(fn, *a):
        out = fn(*a)
        jax.block_until_ready(out)
        out = fn(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*a)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / args.iters * 1e3

    rows = {}

    def rec(name, ms_):
        rows[name] = round(ms_, 2)
        print(json.dumps({"stage": name, "ms": rows[name],
                          "mesh": args.mesh, "rays": n}), flush=True)

    # --- oracle queries -----------------------------------------------------
    q1 = jax.jit(lambda o, d, vert: ifn(o, d, vert, ms.faces, ms.face_valid,
                                        coherent=True).t)
    rec("q1_oracle_coherent", time_it(q1, origin, ray_dir, ms.vertices))

    hits1 = jax.jit(functools.partial(ifn, coherent=True))(
        origin, ray_dir, ms.vertices, ms.faces, ms.face_valid)
    safe_id = jnp.where(hits1.hit, hits1.tri_id, 0)

    # bounce-1 differentiable chain pieces, isolated
    gather = jax.jit(lambda vert: jnp.sum(vert[ms.faces[safe_id]]))
    rec("gather_aos_only", time_it(gather, ms.vertices))

    def mt_chain(vert):
        tri = vert[ms.faces[safe_id]]
        u, vv, t, nrm = moller_trumbore(origin, ray_dir, tri)
        return jnp.sum(t) + jnp.sum(nrm)
    rec("gather_mt", time_it(jax.jit(mt_chain), ms.vertices))

    def b1_chain(vert):
        tri = vert[ms.faces[safe_id]]
        _u, _v, t, nrm = moller_trumbore(origin, ray_dir, tri)
        t = jnp.where(hits1.hit, t, 1.0)
        refracted, no, nd = refract_ray(origin, ray_dir, t, nrm, ior, ext_ior)
        return jnp.sum(no) + jnp.sum(nd)
    rec("bounce1_chain_fwd", time_it(jax.jit(b1_chain), ms.vertices))
    rec("bounce1_chain_grad", time_it(jax.jit(jax.grad(b1_chain)),
                                      ms.vertices))

    # incoherent oracle on bounce-1 exit rays (what q2/q3 cost)
    _r, no, nd = jax.jit(lambda vert: refract_ray(
        origin, ray_dir,
        jnp.where(hits1.hit,
                  moller_trumbore(origin, ray_dir, vert[ms.faces[safe_id]])[2],
                  1.0),
        moller_trumbore(origin, ray_dir, vert[ms.faces[safe_id]])[3],
        ior, ext_ior))(ms.vertices)
    q2 = jax.jit(lambda o, d, vert: ifn(o, d, vert, ms.faces, ms.face_valid,
                                        coherent=False).t)
    rec("q2_oracle_incoherent", time_it(q2, no, nd, ms.vertices))

    # --- composed pipeline --------------------------------------------------
    def trace_fwd(vert):
        m = ms.with_vertices(vert)
        o, d, active, _stats, _tris = trace2(origin, ray_dir, m, ifn, ior,
                                             ext_ior)
        return jnp.sum(o) + jnp.sum(d)
    rec("trace2_fwd", time_it(jax.jit(trace_fwd), ms.vertices))

    def full_fwd(vert):
        m = ms.with_vertices(vert)
        res = render_transparent(origin, ray_dir, m, ifn, ior, ext_ior)
        target = safe_normalize(screen_point - res.origin)
        diff = res.direction - target
        return jnp.sum(jnp.where(res.valid[:, None], diff * diff, 0.0))
    rec("loss_fwd", time_it(jax.jit(full_fwd), ms.vertices))
    rec("loss_grad_step", time_it(jax.jit(jax.value_and_grad(full_fwd)),
                                  ms.vertices))

    # --- SoA variant of the per-bounce gather+MT ---------------------------
    import drt_tpu.render.trace as TR
    old = TR._AOS_GATHER_MAX
    try:
        TR._AOS_GATHER_MAX = 1
        rec("loss_grad_step_soa",
            time_it(jax.jit(jax.value_and_grad(full_fwd)), ms.vertices))
    finally:
        TR._AOS_GATHER_MAX = old

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    payload = {"mesh": args.mesh, "rays": n, "faces": ms.num_faces,
               "stages_ms": rows}
    existing = []
    if os.path.exists(args.out):
        try:
            existing = json.load(open(args.out))
        except ValueError:
            existing = []
    existing = [r for r in existing
                if (r["mesh"], r["rays"]) != (args.mesh, n)] + [payload]
    json.dump(existing, open(args.out, "w"), indent=1)


if __name__ == "__main__":
    main()
