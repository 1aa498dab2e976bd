"""Chunk-culled closest-hit oracle: the TPU-fast XLA backend.

Replaces the OptiX Prime BVH (reference optix_extend.cpp) with a design that
maps onto the TPU's compute units instead of translating GPU traversal:

1.  Faces are Morton-ordered at topology build time (mesh/topology.py), so
    fixed chunks of `tri_chunk` consecutive triangles are spatially tight.
    Chunk AABBs are recomputed from the current vertices on every query —
    the analog of the reference's per-iteration `update_vert` BVH refit
    (optix_extend.cpp:24-27).
2.  Rays are processed in tiles of `ray_tile`. Each tile slab-tests every
    chunk AABB (cheap, VPU), and selects the `max_chunks` nearest candidate
    chunks by entry distance (lax.top_k).
3.  Moller-Trumbore for the candidate set runs as ONE MXU matmul: in Plucker
    coordinates the per-ray feature phi = [d, o x d, o, 1] (10 floats) gives

        det   =  d . (e2 x e1)
        u*det =  (o x d) . e2  -  d . (e2 x v0)
        v*det = -(o x d) . e1  +  d . (e1 x v0)
        t*det =  o . n - v0 . n          (n = e1 x e2)

    i.e. [R,10] @ [10, 4T] — the hot loop lives on the systolic array, not
    the VPU. Sign-aware comparisons (multiplying through by sign(det))
    classify hits without any division; the single division happens only for
    the winning t.

Exactness: candidate chunks are processed in nearest-first waves of
`max_chunks` inside a while_loop that exits as soon as no unprocessed chunk
could still beat any ray's current best hit. Coherent tiles (camera rays,
and bounce rays — lanes keep pixel order, so tiles stay spatially coherent
through the trace) exit after one wave; fully incoherent tiles degrade
gracefully toward brute force but remain exact. Validated bit-for-bit
against the brute oracle in tests. Misses return t=inf, tri_id=-1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from drt_tpu.intersect.api import Hits

_UV_EPS = 1e-5


def _pad_axis0(x, m):
    n = x.shape[0]
    p = (-n) % m
    if p:
        x = jnp.pad(x, ((0, p),) + ((0, 0),) * (x.ndim - 1))
    return x


def _triangle_coefficients(vertices, faces, face_valid, shift):
    """[F,10,4] Plucker MT coefficient tensor (see module docstring)."""
    tri = vertices[faces].astype(jnp.float32) - shift[None, None, :]
    v0 = tri[:, 0]
    e1 = tri[:, 1] - v0
    e2 = tri[:, 2] - v0
    n = jnp.cross(e1, e2)

    zeros = jnp.zeros_like(v0)
    one = jnp.ones(v0.shape[:1], jnp.float32)
    # rows: d(3), w(3), o(3), 1  — columns: det, u*det, v*det, t*det
    col_det = jnp.concatenate(
        [jnp.cross(e2, e1), zeros, zeros, jnp.zeros_like(one)[:, None]], axis=1)
    col_u = jnp.concatenate(
        [-jnp.cross(e2, v0), e2, zeros, jnp.zeros_like(one)[:, None]], axis=1)
    col_v = jnp.concatenate(
        [jnp.cross(e1, v0), -e1, zeros, jnp.zeros_like(one)[:, None]], axis=1)
    col_t = jnp.concatenate(
        [zeros, zeros, n, -jnp.sum(v0 * n, axis=1, keepdims=True)], axis=1)
    coef = jnp.stack([col_det, col_u, col_v, col_t], axis=2)  # [F,10,4]
    # Degenerate/padded triangles: zero coefficients -> det=0 -> never valid.
    return jnp.where(face_valid[:, None, None], coef, 0.0)


def _chunk_aabbs(vertices, faces, face_valid, shift, tri_chunk):
    tri = vertices[faces].astype(jnp.float32) - shift[None, None, :]
    big = jnp.float32(3e38)
    lo = jnp.where(face_valid[:, None, None], tri, big).min(axis=1)
    hi = jnp.where(face_valid[:, None, None], tri, -big).max(axis=1)
    lo = _pad_axis0(lo, tri_chunk).reshape(-1, tri_chunk, 3)
    hi = _pad_axis0(hi, tri_chunk).reshape(-1, tri_chunk, 3)
    # chunk_valid: a chunk made entirely of padding faces must never be a
    # candidate (its inverted +-big AABB would still pass a min/max slab test)
    fv = _pad_axis0(face_valid, tri_chunk).reshape(-1, tri_chunk)
    return lo.min(axis=1), hi.max(axis=1), fv.any(axis=1)  # [NC,3]x2, [NC]


def intersect_culled(origins, dirs, vertices, faces, face_valid=None, *,
                     t_min: float = 0.0, ray_tile: int = 256,
                     tri_chunk: int = 256, max_chunks: int = 8,
                     tile_group: int = 32) -> Hits:
    """Closest hit for each ray. Misses: t=inf, tri_id=-1."""
    N = origins.shape[0]
    F = faces.shape[0]
    if face_valid is None:
        face_valid = jnp.ones((F,), dtype=bool)

    # Shift the scene so coordinates are small (better f32 products in the
    # Plucker features, which multiply positions together).
    shift = jax.lax.stop_gradient(jnp.mean(origins.astype(jnp.float32),
                                           axis=0))

    o = origins.astype(jnp.float32) - shift
    d = dirs.astype(jnp.float32)

    coef = _triangle_coefficients(vertices, faces, face_valid, shift)
    coef = _pad_axis0(coef, tri_chunk)
    NC = coef.shape[0] // tri_chunk
    coef_c = coef.reshape(NC, tri_chunk, 10, 4)
    lo_c, hi_c, chunk_valid = _chunk_aabbs(vertices, faces, face_valid,
                                           shift, tri_chunk)

    K = min(max_chunks, NC)

    o = _pad_axis0(o, ray_tile)
    d = _pad_axis0(d, ray_tile)
    Np = o.shape[0]

    n_waves = -(-NC // K)

    def per_tile(args):
        ot, dt = args
        # [R,3] each. Slab test against all chunk AABBs.
        inv = 1.0 / jnp.where(jnp.abs(dt) > 1e-20, dt,
                              jnp.where(dt >= 0, 1e-20, -1e-20))
        t1 = (lo_c[None] - ot[:, None]) * inv[:, None]     # [R,NC,3]
        t2 = (hi_c[None] - ot[:, None]) * inv[:, None]
        t_entry = jnp.max(jnp.minimum(t1, t2), axis=-1)    # [R,NC]
        t_exit = jnp.min(jnp.maximum(t1, t2), axis=-1)
        overlap = (t_entry <= t_exit) & (t_exit > t_min) & chunk_valid[None]
        # Tile-level candidate score: nearest entry over rays that overlap.
        score = jnp.min(jnp.where(overlap, jnp.maximum(t_entry, 0.0),
                                  jnp.inf), axis=0)        # [NC]
        order = jnp.argsort(score)                         # nearest first
        rank = jnp.argsort(order)                          # chunk -> wave pos

        wray = jnp.cross(ot, dt)
        phi = jnp.concatenate(
            [dt, wray, ot, jnp.ones((ot.shape[0], 1), jnp.float32)], axis=1)

        def improvable(wave, best):
            """Can any unprocessed chunk still beat any ray's best?"""
            unproc = rank[None, :] >= wave * K             # [1,NC]
            return jnp.any(overlap & unproc & (t_entry < best[:, None])
                           & jnp.isfinite(score)[None, :])

        def cond(c):
            wave, best, _ = c
            return (wave < n_waves) & improvable(wave, best)

        def body(c):
            wave, best, best_id = c
            idx = jax.lax.dynamic_slice(order, (wave * K,), (K,))
            cand_ok = jnp.isfinite(score[idx])             # [K]
            M = coef_c[idx].reshape(K * tri_chunk, 10, 4)
            # precision=HIGHEST is load-bearing: TPU f32 matmuls default to
            # one-pass bf16 on the MXU, whose input rounding (~2^-8 relative,
            # absolute ~1.5 units at camera-distance coefficient magnitudes)
            # exceeds u*det/v*det signal size for small triangles and
            # misclassifies whole triangles as misses (silhouette "holes" on
            # >100k-face meshes at capture resolution).
            vals = jnp.einsum("rp,tpc->rtc", phi, M,
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)  # [R,KC,4]
            det, ud, vd, td = (vals[..., i] for i in range(4))
            s = jnp.sign(det)
            absdet = jnp.abs(det)
            eps = _UV_EPS * absdet
            ok = ((absdet > 1e-16)
                  & (ud * s >= -eps) & (vd * s >= -eps)
                  & ((ud + vd) * s <= absdet + eps)
                  & (td * s > t_min * absdet))
            ok = ok & jnp.repeat(cand_ok, tri_chunk)[None, :]
            t_all = jnp.where(ok, td / jnp.where(absdet > 1e-16, det, 1.0),
                              jnp.inf)
            wave_best = jnp.min(t_all, axis=1)
            arg = jnp.argmin(t_all, axis=1)
            tri_global = (idx[arg // tri_chunk] * tri_chunk
                          + arg % tri_chunk).astype(jnp.int32)
            better = wave_best < best
            return (wave + 1,
                    jnp.where(better, wave_best, best),
                    jnp.where(better, tri_global, best_id))

        init = (jnp.int32(0),
                jnp.full((ot.shape[0],), jnp.inf, jnp.float32),
                jnp.full((ot.shape[0],), -1, jnp.int32))
        _, best, best_id = jax.lax.while_loop(cond, body, init)
        return best, best_id

    # Tiles are vmapped in groups so one dispatch covers `tile_group` tiles
    # (sequential per-tile dispatch would dominate runtime); groups are then
    # scanned. A vmapped while_loop runs until every tile in the group is
    # done — groups of spatially adjacent tiles finish together.
    n_tiles = Np // ray_tile
    group = max(1, min(tile_group, n_tiles))
    n_groups = -(-n_tiles // group)
    pad_tiles = n_groups * group - n_tiles
    ot = o.reshape(n_tiles, ray_tile, 3)
    dt = d.reshape(n_tiles, ray_tile, 3)
    if pad_tiles:
        ot = jnp.pad(ot, ((0, pad_tiles), (0, 0), (0, 0)))
        dt = jnp.pad(dt, ((0, pad_tiles), (0, 0), (0, 0)),
                     constant_values=1.0)
    ot = ot.reshape(n_groups, group, ray_tile, 3)
    dt = dt.reshape(n_groups, group, ray_tile, 3)
    bt, bi = jax.lax.map(jax.vmap(per_tile), (ot, dt))
    return Hits(bt.reshape(-1)[:N], bi.reshape(-1)[:N])
