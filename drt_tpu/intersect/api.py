"""The hit oracle: closest ray-triangle intersection, non-differentiable.

Replaces the reference's OptiX Prime C++ extension (optix_extend.cpp:29-57,
called via Scene.optix_intersect, DiffRender.py:386-392). Key design split
preserved from the reference (SURVEY.md §1): the oracle is a pure
stop-gradient "which triangle does this ray hit" query; the differentiable
(u,v,t,n) are recomputed by `geometry.mt.moller_trumbore` on the matched
triangles, so no gradient ever depends on the oracle internals.

Backends:
- "brute":  blocked all-pairs Möller–Trumbore (jnp). Exact, CPU-runnable, the
  "fake OptiX" for tests (SURVEY.md §4).
- "culled": two-level AABB-cull intersector (jnp) — Morton-ordered triangle
  chunks with bounding boxes; skips MT for chunks a ray block cannot hit.
- "pallas": hand-written TPU kernel version of the culled traversal.

All backends share the convention: returns Hits(t [N] f32, tri_id [N] i32)
with tri_id == -1 and t == inf for misses (the reference encodes miss as
t <= 0, DiffRender.py:391).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class Hits(NamedTuple):
    t: jnp.ndarray       # [N] float32, inf on miss
    tri_id: jnp.ndarray  # [N] int32, -1 on miss

    @property
    def hit(self) -> jnp.ndarray:
        return self.tri_id >= 0


import functools
import os


@functools.lru_cache(maxsize=1)
def _resort_ab_table():
    """Measured incoherent-strategy A/B (scripts/resort_ab.py): a list of
    {"faces_padded": F, "winner": "ray"|"resort"} rows, or () if absent."""
    import json
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "..", "..", "reports", "resort_ab.json")
    try:
        with open(os.path.normpath(path)) as fh:
            rows = json.load(fh)
        return tuple((int(r["faces_padded"]), str(r["winner"]))
                     for r in rows if "winner" in r)
    except (OSError, ValueError, KeyError, TypeError):
        return ()


def _auto_incoherent(num_faces: int) -> str:
    """Nearest measured regime's winner; 'ray' (the exact per-ray prepass)
    when no measurement exists — never guess a perf default."""
    import math
    tab = _resort_ab_table()
    if not tab:
        return "ray"
    _, winner = min(tab, key=lambda kv:
                    abs(math.log(kv[0] / max(num_faces, 1))))
    return winner


def get_intersect_fn(backend: str = "auto", incoherent: str = "auto",
                     **kw) -> Callable:
    """Returns intersect(origins[N,3], dirs[N,3], vertices, faces, face_valid)
    -> Hits. The returned callable is jit-safe and non-differentiable
    (stop_gradient applied to its outputs).

    incoherent: strategy for coherent=False queries on the pallas backend —
    "ray" = exact per-ray candidate prepass (O(N*NC) slab tests);
    "resort" = Morton re-sort the rays so the cheap tile-frustum prepass
    applies, then scatter hits back (intersect/resort.py); "auto" = resort
    on streaming-size meshes where the per-ray prepass dominates the step
    (measured crossover, see reports/resort_ab.json), per-ray below."""
    if backend == "auto":
        if jax.default_backend() == "tpu":
            backend = "pallas"      # falls back per-mesh via pallas_fits
        else:
            backend = "culled"
    if backend == "brute":
        from drt_tpu.intersect.brute import intersect_brute as fn
    elif backend == "culled":
        from drt_tpu.intersect.culled import intersect_culled as fn
    elif backend == "pallas":
        # handles all mesh sizes: VMEM-resident coefficients for small
        # meshes, HBM-streaming double-buffered DMA for large ones
        from drt_tpu.intersect.pallas_kernel import intersect_pallas as fn
    else:
        raise ValueError(f"unknown intersect backend: {backend}")

    def wrapped(origins, dirs, vertices, faces, face_valid=None, *,
                coherent: bool = True):
        # Detach ALL inputs: the oracle is non-differentiable by design
        # (the reference casts to float32 OptiX buffers, DiffRender.py:387-388)
        # and its internals (Pallas kernels) have no JVP rules.
        #
        # coherent=False declares the ray population spatially incoherent
        # (post-refraction bounce/exit rays): the Pallas backend then uses
        # the exact per-ray candidate prepass instead of the tile-frustum
        # one, whose per-tile interval union explodes ~16x on divergent
        # rays (round-4 profile: dog full view bounce-2 candidates 610k
        # tile vs 56k ray — the whole round-3 streaming regression).
        sg = jax.lax.stop_gradient
        kw2 = kw
        if backend == "pallas" and not coherent:
            strat = incoherent
            if strat == "auto":
                # Resolved by measurement (scripts/resort_ab.py writes
                # reports/resort_ab.json): until an A/B on the real chip
                # shows the re-sort winning for a regime, auto stays on the
                # exact per-ray prepass.
                strat = _auto_incoherent(faces.shape[0])
            if strat == "resort":
                from drt_tpu.intersect.resort import resorted_intersect
                kw2 = dict(kw)
                kw2.setdefault("prepass", "tile")
                hits = resorted_intersect(
                    fn, sg(origins), sg(dirs), sg(vertices), faces,
                    face_valid, **kw2)
                return Hits(sg(hits.t), sg(hits.tri_id))
            kw2 = dict(kw)
            kw2.setdefault("prepass", "ray")
        hits = fn(sg(origins), sg(dirs), sg(vertices), faces, face_valid,
                  **kw2)
        return Hits(sg(hits.t), sg(hits.tri_id))

    return wrapped
