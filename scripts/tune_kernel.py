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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--meshes", nargs="*",
                    default=["mouse_vh", "dog_vh", "monkey_vh"])
    ap.add_argument("--resy", type=int, default=960)
    ap.add_argument("--resx", type=int, default=1280)
    ap.add_argument("--ray-tiles", nargs="*", type=int,
                    default=[256, 512, 1024])
    ap.add_argument("--tri-chunks", nargs="*", type=int,
                    default=[64, 128, 256])
    ap.add_argument("--prepasses", nargs="*", default=["ray", "tile"],
                    help="candidate prepass variants to sweep (tile = "
                         "interval frustum test, see pallas_kernel.py)")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--out", default="reports/kernel_tuning.json")
    args = ap.parse_args()

    import jax
    from bench import make_rays
    from drt_tpu.intersect.pallas_kernel import intersect_pallas
    from drt_tpu.mesh import build_mesh_state, load_ply
    from drt_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    rows = []
    for name in args.meshes:
        import numpy as np
        v, f = load_ply(DATA + name + ".ply")
        ms = build_mesh_state(v, f)
        origin, ray_dir, _ = make_rays(v, args.resy, args.resx)
        n = origin.shape[0]
        for rt in args.ray_tiles:
            for tc in args.tri_chunks:
              for pp in args.prepasses:
                fn = jax.jit(functools.partial(
                    intersect_pallas, ray_tile=rt, tri_chunk=tc, prepass=pp))
                try:
                    hits = fn(origin, ray_dir, ms.vertices, ms.faces,
                              ms.face_valid)
                    jax.block_until_ready(hits.t)
                    t0 = time.perf_counter()
                    for _ in range(args.iters):
                        hits = fn(origin, ray_dir, ms.vertices, ms.faces,
                                  ms.face_valid)
                    jax.block_until_ready(hits.t)
                    dt = (time.perf_counter() - t0) / args.iters
                    row = {"mesh": name, "faces": ms.num_faces,
                           # the lookup in tuned_params() sees the padded
                           # buffer size, not the logical count — record it
                           # so sweep keys and lookup keys match (ADVICE.md)
                           "faces_padded": int(ms.faces.shape[0]),
                           "ray_tile": rt, "tri_chunk": tc, "prepass": pp,
                           "oracle_ms": round(dt * 1e3, 2),
                           "mrays_per_s": round(n / dt / 1e6, 2),
                           "hits": int(np.isfinite(
                               np.asarray(hits.t)).sum())}
                except Exception as e:
                    row = {"mesh": name, "ray_tile": rt, "tri_chunk": tc,
                           "prepass": pp, "error": repr(e)[:200]}
                print(json.dumps(row), flush=True)
                rows.append(row)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    json.dump(rows, open(args.out, "w"), indent=1)


if __name__ == "__main__":
    main()
