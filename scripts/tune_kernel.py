"""Sweep the Pallas oracle's tile sizes per mesh-size regime (NOTES_ROUND2
perf follow-up: "tune ray_tile and tri_chunk per mesh size").

Runs intersect_pallas directly (no trace/loss) on a full Pointgray-view ray
batch per mesh, timing each (ray_tile, tri_chunk) combination, and prints a
JSON table. Run on the real TPU chip when it is free:

    python scripts/tune_kernel.py [--meshes mouse_vh dog_vh monkey_vh]
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


def midlod_meshes(targets=(20000, 45000, 90000)):
    """Generate mid-LOD sweep meshes by remeshing dog_vh to the target face
    counts (VERDICT r3 weak #6: the tuning table had nothing between 9k and
    146k faces — exactly where the LOD suite spends most passes). Cached as
    PLYs under reports/tuning_meshes/."""
    import numpy as np
    from drt_tpu.mesh import load_ply, save_ply
    from drt_tpu.remesh import isotropic_remesh

    outdir = "reports/tuning_meshes"
    os.makedirs(outdir, exist_ok=True)
    paths = []
    v, f = load_ply(DATA + "dog_vh.ply")
    tri = v[f]
    L0 = float(np.mean(np.linalg.norm(tri - np.roll(tri, -1, axis=1),
                                      axis=2)))
    for F_target in targets:
        path = os.path.join(outdir, f"dog_mid{F_target // 1000}k.ply")
        if not os.path.exists(path):
            # F scales ~ 1/len^2
            L = L0 * (len(f) / F_target) ** 0.5
            v2, f2 = isotropic_remesh(v, f, L)
            save_ply(path, v2, f2)
        paths.append(path)
    return paths


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--meshes", nargs="*",
                    default=["mouse_vh", "tiger_vh", "dog_vh", "monkey_vh"])
    ap.add_argument("--midlod", action="store_true", default=True)
    ap.add_argument("--no-midlod", dest="midlod", action="store_false")
    ap.add_argument("--fwd-top", type=int, default=3,
                    help="re-rank the top-N configs per mesh by timing the "
                         "FULL forward trace (all three oracle queries with "
                         "their coherence hints), not just the primary-ray "
                         "oracle — the tuned config serves every query")
    ap.add_argument("--resy", type=int, default=960)
    ap.add_argument("--resx", type=int, default=1280)
    ap.add_argument("--ray-tiles", nargs="*", type=int,
                    default=[256, 512, 1024])
    ap.add_argument("--tri-chunks", nargs="*", type=int,
                    default=[64, 128, 256])
    ap.add_argument("--prepasses", nargs="*", default=["ray", "tile"],
                    help="candidate prepass variants to sweep (tile = "
                         "interval frustum test, see pallas_kernel.py)")
    ap.add_argument("--groups", nargs="*", type=int, default=[1],
                    help="chunks-per-group values for the second hierarchy "
                         "level (VERDICT r3 item 8); 1 = flat")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--append", action="store_true",
                    help="extend an existing --out table instead of "
                         "overwriting it (tuned_params ranks merged rows)")
    ap.add_argument("--fwd-only", action="store_true",
                    help="skip the oracle sweep; re-time the FULL forward "
                         "trace for the existing table's best configs per "
                         "mesh and update their fwd_ms in place (use after "
                         "a differentiable-chain change re-orders the "
                         "end-to-end ranking)")
    ap.add_argument("--out", default="reports/kernel_tuning.json")
    args = ap.parse_args()

    import jax
    from bench import make_rays
    from drt_tpu.intersect.pallas_kernel import intersect_pallas
    from drt_tpu.mesh import build_mesh_state, load_ply
    from drt_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    mesh_paths = [DATA + m + ".ply" for m in args.meshes]
    if args.midlod:
        mesh_paths += midlod_meshes()

    prior = []
    if args.fwd_only:
        prior = json.load(open(args.out))

    rows = []
    for path in mesh_paths:
        name = os.path.basename(path)[:-4]
        import numpy as np
        v, f = load_ply(path)
        ms = build_mesh_state(v, f)
        origin, ray_dir, _ = make_rays(v, args.resy, args.resx)
        n = origin.shape[0]
        mesh_rows = []
        if args.fwd_only:
            # Re-time fwd for the existing table's best oracle configs of
            # this mesh; dedupe identical (rt, tc, pp, group) combos.
            seen = set()
            for r in sorted((r for r in prior if r.get("mesh") == name
                             and "oracle_ms" in r),
                            key=lambda r: r["oracle_ms"]):
                key = (r["ray_tile"], r["tri_chunk"], r["prepass"],
                       r.get("group", 1))
                if key not in seen:
                    seen.add(key)
                    r.pop("fwd_ms", None)
                    mesh_rows.append(r)
            mesh_rows = mesh_rows[: 2 * args.fwd_top]
        for rt in ([] if args.fwd_only else args.ray_tiles):
            for tc in args.tri_chunks:
              for pp in args.prepasses:
               for g in args.groups:
                fn = jax.jit(functools.partial(
                    intersect_pallas, ray_tile=rt, tri_chunk=tc, prepass=pp,
                    group=g))
                try:
                    def timed():
                        t0 = time.perf_counter()
                        for _ in range(args.iters):
                            h = fn(origin, ray_dir, ms.vertices, ms.faces,
                                   ms.face_valid)
                        jax.block_until_ready(h.t)
                        return (time.perf_counter() - t0) / args.iters, h

                    hits = fn(origin, ray_dir, ms.vertices, ms.faces,
                              ms.face_valid)
                    jax.block_until_ready(hits.t)
                    dt, hits = timed()
                    if n / dt > 1e9:   # dispatch artifact (first config on
                        dt, hits = timed()   # a cold tunnel) — re-time
                    row = {"mesh": name, "faces": ms.num_faces,
                           # the lookup in tuned_params() sees the padded
                           # buffer size, not the logical count — record it
                           # so sweep keys and lookup keys match (ADVICE.md)
                           "faces_padded": int(ms.faces.shape[0]),
                           "ray_tile": rt, "tri_chunk": tc, "prepass": pp,
                           "group": g,
                           "oracle_ms": round(dt * 1e3, 2),
                           "mrays_per_s": round(n / dt / 1e6, 2),
                           "hits": int(np.isfinite(
                               np.asarray(hits.t)).sum())}
                except Exception as e:
                    row = {"mesh": name, "ray_tile": rt, "tri_chunk": tc,
                           "prepass": pp, "group": g,
                           "error": repr(e)[:200]}
                print(json.dumps(row), flush=True)
                mesh_rows.append(row)

        # Phase 2: re-rank the best primary-oracle configs by the FULL
        # forward trace — bounce-2/exit queries run the measured incoherent
        # strategy (per-ray prepass, or Morton resort + tile prepass when
        # reports/resort_ab.json says it wins; intersect/api.py), so the
        # winning (rt, tc) must be good for those too.
        import jax.numpy as jnp
        from drt_tpu.render.trace import render_transparent
        good = (mesh_rows if args.fwd_only
                else sorted((r for r in mesh_rows if "oracle_ms" in r),
                            key=lambda r: r["oracle_ms"])[:args.fwd_top])
        for row in good:
            def make_fn(rt=row["ray_tile"], tc=row["tri_chunk"],
                        pp=row["prepass"], g=row.get("group", 1)):
                def ifn(o, d, vert, fc, fv, coherent=True):
                    sg = jax.lax.stop_gradient
                    base = dict(ray_tile=rt, tri_chunk=tc, group=g)
                    if coherent:
                        return intersect_pallas(sg(o), sg(d), sg(vert), fc,
                                                fv, prepass=pp, **base)
                    # incoherent queries route like production: the measured
                    # winner from reports/resort_ab.json (api.auto), so the
                    # fwd ranking reflects what the train step will run.
                    from drt_tpu.intersect.api import _auto_incoherent
                    if _auto_incoherent(fc.shape[0]) == "resort":
                        import functools
                        from drt_tpu.intersect.resort import \
                            resorted_intersect
                        return resorted_intersect(
                            functools.partial(intersect_pallas,
                                              prepass="tile", **base),
                            sg(o), sg(d), sg(vert), fc, fv)
                    return intersect_pallas(sg(o), sg(d), sg(vert), fc, fv,
                                            prepass="ray", **base)
                return ifn

            ifn = make_fn()
            fwd = jax.jit(lambda vert: jnp.sum(render_transparent(
                origin, ray_dir, ms.with_vertices(vert), ifn,
                1.4723, 1.00029).direction))
            try:
                jax.block_until_ready(fwd(ms.vertices))
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    out = fwd(ms.vertices)
                jax.block_until_ready(out)
                row["fwd_ms"] = round((time.perf_counter() - t0)
                                      / args.iters * 1e3, 2)
            except Exception as e:
                row["fwd_error"] = repr(e)[:200]
            print(json.dumps(row), flush=True)
        rows.extend(mesh_rows)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    if args.fwd_only:
        # mesh_rows entries are references into `prior` — mutated in place
        json.dump(prior, open(args.out, "w"), indent=1)
        return
    if args.append and os.path.exists(args.out):
        rows = json.load(open(args.out)) + rows
    json.dump(rows, open(args.out, "w"), indent=1)


if __name__ == "__main__":
    main()
