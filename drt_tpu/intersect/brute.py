"""Brute-force closest-hit oracle: blocked all-pairs Möller–Trumbore.

The "fake OptiX" reference backend (SURVEY.md §4): exact by construction,
runs anywhere, and serves as ground truth for the culled/Pallas backends.
Like OptiX Prime (optix_extend.cpp:29-57), it operates in float32 regardless
of the autograd dtype — the differentiable path re-derives its own values.

Blocking: rays are processed in chunks via lax.map (a scan, so peak memory is
one [ray_chunk, tri_chunk] tile set), triangles via an inner fori-style scan
with a running (best_t, best_id) carry.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from drt_tpu.intersect.api import Hits

_UV_EPS = 1e-5       # barycentric tolerance: don't miss hits on shared edges
_DET_EPS = 1e-12     # parallel-ray determinant cutoff


def _prep_triangles(vertices, faces, face_valid, tri_chunk):
    """Precompute (v0, e1, e2, valid) in float32, padded to tri_chunk tiles."""
    tri = vertices[faces].astype(jnp.float32)          # [F,3,3]
    v0 = tri[:, 0]
    e1 = tri[:, 1] - v0
    e2 = tri[:, 2] - v0
    F = tri.shape[0]
    if face_valid is None:
        valid = jnp.ones((F,), dtype=bool)
    else:
        valid = face_valid
    Fp = ((F + tri_chunk - 1) // tri_chunk) * tri_chunk
    pad = Fp - F
    if pad:
        v0 = jnp.pad(v0, ((0, pad), (0, 0)))
        e1 = jnp.pad(e1, ((0, pad), (0, 0)))
        e2 = jnp.pad(e2, ((0, pad), (0, 0)))
        valid = jnp.pad(valid, (0, pad))
    shape = (Fp // tri_chunk, tri_chunk)
    return (v0.reshape(*shape, 3), e1.reshape(*shape, 3),
            e2.reshape(*shape, 3), valid.reshape(shape))


def _mt_block(o, d, v0, e1, e2, tri_valid, t_min):
    """MT test of a ray block [R,3] against a triangle tile [T,3].
    Returns (t [R,T] with inf on miss/invalid)."""
    # [R,1,3] x [1,T,3] broadcasting
    d_ = d[:, None, :]
    o_ = o[:, None, :]
    pvec = jnp.cross(d_, e2[None])                  # [R,T,3]
    det = jnp.sum(e1[None] * pvec, axis=-1)         # [R,T]
    inv_det = 1.0 / jnp.where(jnp.abs(det) > _DET_EPS, det, jnp.inf)
    tvec = o_ - v0[None]                            # [R,T,3]
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1[None])                # [R,T,3]
    v = jnp.sum(d_ * qvec, axis=-1) * inv_det
    t = jnp.sum(e2[None] * qvec, axis=-1) * inv_det
    ok = (
        tri_valid[None]
        & (u >= -_UV_EPS) & (v >= -_UV_EPS) & (u + v <= 1.0 + _UV_EPS)
        & (t > t_min)
    )
    return jnp.where(ok, t, jnp.inf)


def intersect_brute(origins, dirs, vertices, faces, face_valid=None, *,
                    t_min: float = 0.0, ray_chunk: int = 8192,
                    tri_chunk: int = 512) -> Hits:
    """Closest hit for each ray. Misses: t=inf, tri_id=-1."""
    o = origins.astype(jnp.float32)
    d = dirs.astype(jnp.float32)
    N = o.shape[0]
    ray_chunk = min(ray_chunk, max(8, N))
    v0, e1, e2, tv = _prep_triangles(vertices, faces, face_valid, tri_chunk)
    n_tiles = v0.shape[0]

    Np = ((N + ray_chunk - 1) // ray_chunk) * ray_chunk
    if Np != N:
        o = jnp.pad(o, ((0, Np - N), (0, 0)))
        d = jnp.pad(d, ((0, Np - N), (0, 0)))

    def per_chunk(args):
        oc, dc = args

        def body(carry, tile):
            best_t, best_id = carry
            tv0, te1, te2, tvalid, tile_base = tile
            t = _mt_block(oc, dc, tv0, te1, te2, tvalid, t_min)   # [R,T]
            tile_min = jnp.min(t, axis=1)
            tile_arg = jnp.argmin(t, axis=1).astype(jnp.int32) + tile_base
            better = tile_min < best_t
            return (jnp.where(better, tile_min, best_t),
                    jnp.where(better, tile_arg, best_id)), None

        init = (jnp.full((oc.shape[0],), jnp.inf, jnp.float32),
                jnp.full((oc.shape[0],), -1, jnp.int32))
        bases = jnp.arange(n_tiles, dtype=jnp.int32) * tri_chunk
        (bt, bi), _ = jax.lax.scan(body, init, (v0, e1, e2, tv, bases))
        return bt, bi

    oc = o.reshape(Np // ray_chunk, ray_chunk, 3)
    dc = d.reshape(Np // ray_chunk, ray_chunk, 3)
    bt, bi = jax.lax.map(per_chunk, (oc, dc))
    return Hits(bt.reshape(-1)[:N], bi.reshape(-1)[:N])
