"""The 2-bounce differentiable refraction trace — the hot path.

Capability of the reference's `refract_ray` / `trace2` / `render_transparent`
(DiffRender.py:420-432, 503-546), redesigned for TPU/XLA:

- Static shapes + lane masking instead of dynamic ray compaction. The
  reference shrinks the ray population with `Ray.select` after every TIR/miss
  (DiffRender.py:279-283, 540-544), tracking original pixels via `ray_ind`.
  Here every lane keeps its pixel identity by position; an `active` mask is
  carried instead, so the whole trace is one fused XLA computation with no
  dynamic shapes and no scatter at the end.
- All math NaN-free on masked lanes: inactive lanes compute garbage-but-finite
  values that are masked out, so reverse-mode AD never sees NaN.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from drt_tpu.geometry.mt import (moller_trumbore_soa, moller_trumbore_verts)
from drt_tpu.geometry.vec import dot3, fresnel_dielectric, refract

# Batch size above which _bounce switches from the fast AoS triangle gather
# to lane-dense component gathers (see _bounce). The chunked path
# (render/chunked.py) keeps per-chunk batches at AUTO_CHUNK=2^20, so in
# practice only an *unchunked* call beyond a full 1920x1080 view crosses it.
_AOS_GATHER_MAX = 2 ** 21

# Under GSPMD ray sharding, origin.shape[0] at trace time is the GLOBAL
# batch but each device materializes only its 1/n shard of the gather temp
# that motivates _AOS_GATHER_MAX — so the effective per-device threshold is
# _AOS_GATHER_MAX * n_shards. The shard count is threaded EXPLICITLY through
# the call chain (ray_shard_count=) from parallel/sharding down to _bounce:
# a module-global setter here would be exactly the order-dependent mutation
# footgun SURVEY.md §5 flags in the reference's optim.py:178-182.


def debug_enabled() -> bool:
    """Runtime debug mode (reference `debug` flag, DiffRender.py:15):
    DRT_TPU_DEBUG=1 enables the TIR FrDielectric/Refract cross-check
    (DiffRender.py:524-525) and per-bounce finite asserts. Read at trace
    time, so it gates what gets staged into the jitted computation."""
    import os
    return os.environ.get("DRT_TPU_DEBUG", "0") not in ("", "0")


def _debug_check(pred: jnp.ndarray, msg: str) -> None:
    """Stage a device-side invariant check into the traced computation:
    prints the violating-lane count (only) when any lane violates. Not free
    on the happy path, which is why it is DRT_TPU_DEBUG-gated."""
    bad_count = jnp.sum(jnp.logical_not(pred)).astype(jnp.int32)

    def report(c):
        jax.debug.print("DRT_TPU_DEBUG VIOLATION [" + msg + "]: {c} lanes",
                        c=c, ordered=False)
        return c

    jax.lax.cond(bad_count > 0, report, lambda c: c, bad_count)


class TraceResult(NamedTuple):
    origin: jnp.ndarray     # [N,3] exit-ray origin (zeros where invalid)
    direction: jnp.ndarray  # [N,3] exit-ray direction (zeros where invalid)
    valid: jnp.ndarray      # [N] bool — refracted twice AND escaped the mesh
    stats: dict             # diagnostic counters (see trace2)
    tris: tuple = ()        # (tri_b1, tri_b2) hit face ids (0 on dead lanes)
                            # — feeds per-vertex ray-evidence counts


def refract_ray(origin, direction, t, n, int_ior, ext_ior,
                offset_eps: float = 1e-5, offset_rel: float = 1e-4,
                compat: bool = False):
    """One refraction event at a hit point (reference refract_ray,
    DiffRender.py:503-535): pick entering/exiting etas by the sign of
    cos(theta_i), flip the normal for exiting rays, Snell-bend, advance the
    origin by t and nudge it along the new direction.

    The nudge is max(offset_eps, offset_rel * t): the reference's absolute
    1e-5 (DiffRender.py:532) is below float32 resolution at the bundled
    meshes' ~100-unit coordinates (ulp ~ 8e-6), which made exit rays re-hit
    their own surface in the occlusion query (measured: ~1/3 of rays lost
    vs float64). The relative term is scale-free and geometrically
    negligible (1e-4 of the path length).

    compat=True reproduces the reference chain exactly: the Refract variant
    that computes cosThetaT from sin²θI (DiffRender.py:42) and the absolute
    1e-5 origin nudge (DiffRender.py:532) with no relative term. Use with
    float64 inputs — that is the reference's autograd regime; in float32 the
    absolute nudge is below ULP at the bundled meshes' scale.

    Returns (refracted [N] bool — False on TIR, new_origin, new_dir).
    """
    wo = -direction
    cos_i = jnp.clip(dot3(wo, n), -1.0, 1.0)
    entering = cos_i > 0

    eta_i = jnp.where(entering, ext_ior, int_ior)
    eta_t = jnp.where(entering, int_ior, ext_ior)
    n_f = jnp.where(entering[..., None], n, -n)
    cos_f = jnp.abs(cos_i)

    tir_fr, _R = fresnel_dielectric(cos_f, eta_i, eta_t)  # reflectance
    # (unused in the reference's loss too — it keeps only the refracted
    # branch, DiffRender.py:520-530; R is exposed for future reflection)
    tir, wt = refract(wo, n_f, eta_i / eta_t,
                      compat_cos_from_incident=compat)
    refracted = jnp.logical_not(tir)
    if debug_enabled():
        # The reference's debug assert: FrDielectric and Refract must agree
        # on which lanes are total-internal-reflection (DiffRender.py:524-525).
        _debug_check(tir_fr == tir, "TIR FrDielectric/Refract mismatch")

    if compat:
        offset = jnp.asarray(offset_eps, wt.dtype)
    else:
        offset = jax.lax.stop_gradient(
            jnp.maximum(offset_eps, offset_rel * jnp.abs(t)))[..., None]
    new_origin = origin + t[..., None] * direction + offset * wt
    return refracted, new_origin, wt


@jax.custom_vjp
def _gather_tri9(vertices, faces, safe_id):
    """[N,9] per-ray triangle rows: the 9 coordinates of each ray's matched
    triangle, contiguous in lanes (pad 9 -> 128, 14x — vs the ~113x (8,128)
    tiling of a [N,3,3] AoS gather).

    Forward picks the cheaper route by which side of the gather is smaller:
    - ray-dominated (N >= F, full views): [F,9] triangle soup from ONE
      mesh-sized [3F,3] row gather, then a [N,9] row gather.
    - face-dominated (N < F, low-res views of large meshes): direct [3N,3]
      vertex-row gather + repack (an [F,9] soup would cost more than the
      batch — measured: dog 256^2 step 52 -> 70 ms with soup-always).

    Backward is pinned (custom_vjp) to the direct transpose — reshape the
    [N,9] cotangent to [3N,3] rows and ONE scatter-add into [V,3] — because
    AD of the soup route scatters [N,9] -> [F,9] first, which measured ~2x
    slower on the streaming meshes (dog full-view step bwd 131 -> 255 ms).
    """
    if safe_id.shape[0] >= faces.shape[0]:
        tri9 = vertices[faces.reshape(-1)].reshape(-1, 9)
        return tri9[safe_id]
    return vertices[faces[safe_id].reshape(-1)].reshape(-1, 9)


# Backward-scatter route threshold: accumulate the [N,9] cotangent into a
# per-face [F,9] buffer first when the padded face buffer is at most this
# (two cheap row scatters: N rows into F, then 3F rows into V); above it the
# [F,9] accumulation itself dominates and one direct [3N,3] -> [V,3] scatter
# wins (measured, v5e, full 1.23M-ray view: mouse F=16k soup-bwd 29 ms vs
# direct 200+; dog F=262k soup-bwd 255 ms vs direct ~130).
_SOUP_BWD_MAX_FACES = 2 ** 16


def _gather_tri9_fwd(vertices, faces, safe_id):
    idx3 = faces[safe_id].reshape(-1)          # residual: [3N] vertex rows
    return _gather_tri9(vertices, faces, safe_id), \
        (idx3, jnp.zeros_like(vertices), faces, safe_id)


def _gather_tri9_bwd(res, dg9):
    idx3, dv0, faces, safe_id = res
    if faces.shape[0] <= _SOUP_BWD_MAX_FACES:
        df9 = jnp.zeros((faces.shape[0], 9), dg9.dtype).at[safe_id].add(dg9)
        dv = dv0.at[faces.reshape(-1)].add(df9.reshape(-1, 3))
    else:
        dv = dv0.at[idx3].add(dg9.reshape(-1, 3))
    return dv, jnp.zeros_like(faces), jnp.zeros_like(safe_id)


_gather_tri9.defvjp(_gather_tri9_fwd, _gather_tri9_bwd)


def _accepts_coherent(fn) -> bool:
    """True if `fn` takes a `coherent` keyword (the get_intersect_fn
    wrappers do; bare backend functions and test doubles may not)."""
    import inspect
    try:
        params = inspect.signature(fn).parameters
    except (TypeError, ValueError):
        return False
    return ("coherent" in params
            or any(p.kind is inspect.Parameter.VAR_KEYWORD
                   for p in params.values()))


def _park_rays(origin, direction, active, mesh):
    """Replace dead lanes' rays with a ray strictly outside the mesh AABB
    pointing away from it, so they generate ZERO oracle work (candidate
    lists, MT tests) in later queries. The reference gets this for free by
    compacting (Ray.select, DiffRender.py:540-544); with static lanes the
    dead rays otherwise re-trace their stale path through the whole mesh
    every subsequent query (~93% of a full dog view after bounce 1)."""
    v = jax.lax.stop_gradient(mesh.vertices)
    vmin = jnp.min(v, axis=0)
    vmax = jnp.max(v, axis=0)
    park_o = vmin - (vmax - vmin) - 1.0
    park_d = jnp.full((3,), -0.57735027, direction.dtype)  # away from box
    m = active[..., None]
    return (jnp.where(m, origin, park_o.astype(origin.dtype)),
            jnp.where(m, direction, park_d))


def _bounce(origin, direction, active, mesh, intersect_fn, int_ior, ext_ior,
            offset_eps, compat=False, coherent=True, pass_hint=False,
            ray_shard_count=1):
    if pass_hint:
        hits = intersect_fn(origin, direction, mesh.vertices, mesh.faces,
                            mesh.face_valid, coherent=coherent)
    else:
        hits = intersect_fn(origin, direction, mesh.vertices, mesh.faces,
                            mesh.face_valid)
    hit = hits.hit
    safe_id = jnp.where(hit, hits.tri_id, 0)
    n_rays = origin.shape[0]
    if n_rays <= _AOS_GATHER_MAX * max(1, int(ray_shard_count)):
        # Fast path: assemble a [N,9] row layout (9 contiguous floats pad
        # 9 -> 128 lanes, 14x) and feed the verts-form MT with [N,3] lane
        # slices — never materializing a [N,3,3] buffer, whose (3,3) minor
        # dims tile to the TPU's (8,128) vector tile (~113x traffic).
        # _gather_tri9 picks the cheaper forward route (soup vs direct) and
        # pins the backward to ONE [3N,3]-row scatter into [V,3].
        # Measured (v5e): mouse full-view step 199 -> 100 ms, tiger ss2
        # 1161 -> 596 ms; bounce chain fwd 31.5 -> 7.2 ms vs the AoS
        # gather. The SoA variant's 9 scalar gathers were 2x worse still.
        g9 = _gather_tri9(mesh.vertices, mesh.faces, safe_id)
        _u, _v, t, n = moller_trumbore_verts(
            origin, direction, g9[:, 0:3], g9[:, 3:6], g9[:, 6:9])
    else:
        # Memory path for huge unchunked batches: nine [N]-from-[F]
        # component gathers keep every buffer lane-dense — the single AoS
        # gather would materialize an 11.9 GB padded temp at 8.3M rays
        # (the BASELINE config-5 OOM); the [F,3,3] soup gather is
        # mesh-sized and cheap.
        soup = mesh.vertices[mesh.faces]              # [F,3,3]
        v0, v1, v2 = (tuple(soup[:, k, j][safe_id] for j in range(3))
                      for k in range(3))
        o3 = tuple(origin[..., j] for j in range(3))
        d3 = tuple(direction[..., j] for j in range(3))
        _u, _v, t, n3 = moller_trumbore_soa(o3, d3, v0, v1, v2)
        n = jnp.stack(n3, axis=-1)
    t = jnp.where(hit, t, 1.0)                        # finite on masked lanes
    refracted, new_o, new_d = refract_ray(
        origin, direction, t, n, int_ior, ext_ior, offset_eps, compat=compat)
    active = active & hit & refracted
    m = active[..., None]
    # Dead lanes get PARKED rays (outside the AABB, pointing away) instead
    # of their stale previous ray, so subsequent oracle queries spend zero
    # candidate/MT work on them (see _park_rays).
    o_out, d_out = _park_rays(jnp.where(m, new_o, origin),
                              jnp.where(m, new_d, direction), active, mesh)
    if debug_enabled():
        # Active lanes must carry finite geometry into the next query.
        fin = jnp.isfinite(o_out).all(-1) & jnp.isfinite(d_out).all(-1)
        _debug_check(jnp.logical_not(active) | fin,
                     "non-finite ray after bounce")
    return o_out, d_out, active, jnp.where(active, safe_id, 0)


def trace2(origin, direction, mesh, intersect_fn: Callable,
           int_ior: float, ext_ior: float = 1.00029,
           offset_eps: float = 1e-5, compat: bool = False,
           lane_mask=None, ray_shard_count: int = 1):
    """Exactly two refraction bounces (reference trace2, DiffRender.py:537-546).
    Returns (origin, direction, active): lanes that refracted at both bounces.
    compat=True: reference-exact chain (see refract_ray).
    lane_mask [N] bool: lanes that start inactive (padding lanes of the
    chunked path, matting-invalid pixels) — they trace garbage-but-finite
    values, produce valid=False, and are excluded from the stats counters.
    ray_shard_count: how many ways the ray axis is GSPMD-sharded — scales
    the per-device AoS-gather memory threshold (see _AOS_GATHER_MAX).
    """
    active = (jnp.ones(origin.shape[:-1], dtype=bool)
              if lane_mask is None else lane_mask)
    o, d = origin, direction
    stats = {}
    tris = []
    pass_hint = _accepts_coherent(intersect_fn)
    for b in range(2):
        prev = jnp.sum(active)
        # Bounce 1 sees camera-pixel rays (spatially coherent tiles);
        # bounce 2 sees refracted interior rays (incoherent) — the oracle's
        # candidate prepass strategy differs (intersect/api.py).
        o, d, active, tri = _bounce(o, d, active, mesh, intersect_fn,
                                    int_ior, ext_ior, offset_eps,
                                    compat=compat, coherent=(b == 0),
                                    pass_hint=pass_hint,
                                    ray_shard_count=ray_shard_count)
        tris.append(tri)
        # survivors after this bounce; the drop is miss+TIR lanes
        stats[f"active_after_bounce{b + 1}"] = jnp.sum(active)
        stats[f"dropped_bounce{b + 1}"] = prev - jnp.sum(active)
    return o, d, active, stats, tuple(tris)


def render_transparent(origin, direction, mesh, intersect_fn: Callable,
                       int_ior: float, ext_ior: float = 1.00029,
                       offset_eps: float = 1e-5,
                       compat: bool = False, lane_mask=None,
                       ray_shard_count: int = 1) -> TraceResult:
    """Trace 2 bounces, then require the exit ray to escape (not re-hit the
    mesh) — the reference's third occlusion query (DiffRender.py:420-432).
    Dense per-pixel output; invalid lanes are zeroed like the reference's
    scatter into zeros."""
    o, d, active, stats, tris = trace2(origin, direction, mesh, intersect_fn,
                                       int_ior, ext_ior, offset_eps,
                                       compat=compat, lane_mask=lane_mask,
                                       ray_shard_count=ray_shard_count)
    if _accepts_coherent(intersect_fn):
        hits = intersect_fn(o, d, mesh.vertices, mesh.faces, mesh.face_valid,
                            coherent=False)
    else:
        hits = intersect_fn(o, d, mesh.vertices, mesh.faces, mesh.face_valid)
    valid = active & jnp.logical_not(hits.hit)
    stats["occluded_exit"] = jnp.sum(active & hits.hit)
    stats["valid_rays"] = jnp.sum(valid)
    m = valid[..., None]
    return TraceResult(jnp.where(m, o, 0.0), jnp.where(m, d, 0.0), valid,
                       stats, tris)


def render_mask(origin, direction, mesh, intersect_fn: Callable) -> jnp.ndarray:
    """Binary hit image [N] (reference render_mask, DiffRender.py:434-438)."""
    hits = intersect_fn(origin, direction, mesh.vertices, mesh.faces,
                        mesh.face_valid)
    return hits.hit.astype(origin.dtype)
