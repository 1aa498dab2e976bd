"""Differentiable Möller–Trumbore ray-triangle re-intersection.

The capability of the reference's `JIT_Dintersect` (DiffRender.py:65-121):
given each ray *already matched* to a triangle by the non-differentiable hit
oracle, recompute barycentrics (u,v), hit distance t, and the geometric face
normal — differentiably w.r.t. the triangle vertices. This is the funnel all
vertex gradients flow through.

The reference computes `inv_det = 1/det` with no epsilon (DiffRender.py:82),
safe only because OptiX pre-filtered hits; here masked/padded lanes can carry
degenerate triangles, so det is guarded to keep every lane finite (guarded
lanes are masked out downstream and contribute zero gradient).
"""

from __future__ import annotations

import jax.numpy as jnp

from drt_tpu.geometry.vec import dot3, safe_normalize


def moller_trumbore(origin: jnp.ndarray, ray_dir: jnp.ndarray,
                    triangles: jnp.ndarray, det_eps: float = 1e-12):
    """Per-ray matched-triangle intersection.

    origin, ray_dir: [...,3]; triangles: [...,3,3] (vertex, xyz).
    Returns (u, v, t, n): barycentrics [...], distance [...], unit geometric
    normal [...,3] (normalized cross of edges, as the reference uses —
    vertex-normal interpolation is intentionally disabled there,
    DiffRender.py:103-114).
    """
    v0 = triangles[..., 0, :]
    v1 = triangles[..., 1, :]
    v2 = triangles[..., 2, :]
    edge1 = v1 - v0
    edge2 = v2 - v0

    pvec = jnp.cross(ray_dir, edge2)
    det = dot3(edge1, pvec)
    det_safe = jnp.where(jnp.abs(det) > det_eps, det, det_eps)
    inv_det = 1.0 / det_safe

    tvec = origin - v0
    u = dot3(tvec, pvec) * inv_det
    qvec = jnp.cross(tvec, edge1)
    v = dot3(ray_dir, qvec) * inv_det
    t = dot3(edge2, qvec) * inv_det

    n = safe_normalize(jnp.cross(edge1, edge2))
    return u, v, t, n
