"""Silhouette-edge detection and the differentiable edge sampler.

Capabilities of the reference's `silhouette_edge` (DiffRender.py:445-457),
`primary_visibility` (DiffRender.py:459-479) and the `primary_edge_sample`
custom autograd Function (DiffRender.py:189-267), redesigned for static
shapes: instead of compacting to the (data-dependent) set of silhouette
edges, a fixed-size budget of K edges is selected with `jnp.nonzero(size=K)`
and carried with a validity mask.

Gradient structure is identical to the reference: the screen-space edge
sampler's backward turns the per-edge occupancy residual into 2D endpoint
gradients dE_pos = -N * f * g (DiffRender.py:236-242, 263-267); those flow
through the (depth-detached) camera projection into the vertices. The ray
casts inside the sampler are a non-differentiable oracle query — all oracle
inputs cross the custom_vjp boundary as explicit arguments with zero
cotangents (never as closed-over tracers).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from drt_tpu.render.camera import CameraM, project_vertices


def silhouette_edge_mask(vertices, faces, edge_faces, edge_valid,
                         cam_origin) -> jnp.ndarray:
    """[Ep] bool: edges whose two adjacent faces have opposite front-facing
    w.r.t. the camera origin (XOR test, reference DiffRender.py:445-457).
    Operates on detached vertices like the reference (DiffRender.py:447)."""
    v = jax.lax.stop_gradient(vertices)
    ef = faces[edge_faces]                       # [Ep,2,3]
    tri = v[ef]                                  # [Ep,2,3,3]
    e1 = tri[:, :, 1, :] - tri[:, :, 0, :]
    e2 = tri[:, :, 2, :] - tri[:, :, 0, :]
    n = jnp.cross(e1, e2)                        # unnormalized is fine for sign
    to_cam = cam_origin[None, None, :] - tri[:, :, 0, :]
    d = jnp.sum(n * to_cam, axis=-1)             # [Ep,2]
    return jnp.logical_xor(d[:, 0] > 0, d[:, 1] > 0) & edge_valid


class EdgeSamples(NamedTuple):
    pixel: jnp.ndarray    # [K,2] int32 (x, y) sampled pixel per edge
    pixel_f: jnp.ndarray  # [K,2] float sample point (detached) — for
                          # bilinear mask sampling
    output: jnp.ndarray   # [K] the 0.5 occupancy value (grads flow here)
    valid: jnp.ndarray    # [K] bool — selected, boundary-crossing, in view
    count: jnp.ndarray    # [] int32 — TRUE number of silhouette edges in
                          # this view (may exceed K; the caller must surface
                          # count > K instead of truncating silently)


def _edge_sample_fwd_math(E_pos, camera: CameraM, cam_origin, intersect_fn,
                          oracle_args):
    """Shared forward computation. E_pos: [K,2,2] projected edge endpoints.
    Returns (sample_point [K,2], N [K,2] screen edge normal, f [K] occupancy
    difference)."""
    ax, ay = E_pos[:, 0, 0], E_pos[:, 0, 1]
    bx, by = E_pos[:, 1, 0], E_pos[:, 1, 1]
    x = (ax + bx) * 0.5
    y = (ay + by) * 0.5
    sample_point = jnp.stack([x, y], axis=1)           # [K,2]

    # Edge normal in screen space: alpha(x,y) = (ay-by)x + (bx-ax)y + ...
    N = jnp.stack([ay - by, bx - ax], axis=1)          # [K,2]
    N_unit = N / jnp.maximum(jnp.linalg.norm(N, axis=1, keepdims=True), 1e-12)

    eps = 1.0                                          # +-1 px offsets
    fu = sample_point + eps * N_unit
    fl = sample_point - eps * N_unit
    f_point = jnp.concatenate([fu, fl], axis=0)        # [2K,2]

    # Back-project offset pixels to world rays (reference DiffRender.py:216-224;
    # directions intentionally un-normalized, hit test is t>0 invariant).
    ones = jnp.ones((f_point.shape[0], 1), dtype=f_point.dtype)
    # full-precision matmuls: bf16 MXU default rounds pixel-magnitude
    # coordinates by whole pixels (see render/camera.py)
    _mm = lambda a, b: jnp.matmul(a, b,
                                  precision=jax.lax.Precision.HIGHEST)
    cam_p = _mm(jnp.concatenate([f_point, ones], axis=1), camera.K_inv.T)
    world_p = _mm(jnp.concatenate([cam_p, ones], axis=1),
                  camera.R_inv.T)[:, :3]
    ray_dir = world_p - cam_origin[None, :]
    ray_org = jnp.broadcast_to(cam_origin, ray_dir.shape)

    vertices, faces, face_valid = oracle_args
    hits = intersect_fn(ray_org, ray_dir, vertices, faces, face_valid)
    K = E_pos.shape[0]
    occ = hits.hit.astype(E_pos.dtype)
    f = occ[:K] - occ[K:]                              # inside - outside

    return sample_point, N, f


def make_edge_sampler(intersect_fn: Callable):
    """Build the custom-vjp edge sampler around an oracle intersect_fn
    (a plain function; mesh arrays are passed per call via `oracle_args`).

    Returns sample(E_pos, camera, cam_origin, oracle_args)
    -> (pixel [K,2] i32, output [K], f [K], bc_valid [K]) where gradients
    w.r.t. E_pos follow the reference's backward (DiffRender.py:263-267);
    every other input gets zero gradient.
    """

    def _fwd_math(E_pos, camera, cam_origin, oracle_args):
        sample_point, N, f = _edge_sample_fwd_math(
            E_pos, camera, cam_origin, intersect_fn, oracle_args)
        pixel = sample_point.astype(jnp.int32)
        output = jnp.full((E_pos.shape[0],), 0.5, dtype=E_pos.dtype)
        bc_valid = jnp.abs(f) > 1e-5                   # boundary-crossing
        return pixel, output, f, bc_valid, N

    @jax.custom_vjp
    def sample(E_pos, camera, cam_origin, oracle_args):
        pixel, output, f, bc_valid, _N = _fwd_math(
            E_pos, camera, cam_origin, oracle_args)
        return pixel, output, f, bc_valid

    def fwd(E_pos, camera, cam_origin, oracle_args):
        pixel, output, f, bc_valid, N = _fwd_math(
            E_pos, camera, cam_origin, oracle_args)
        return (pixel, output, f, bc_valid), (N, f, camera, cam_origin,
                                              oracle_args)

    def bwd(res, grads):
        N, f, camera, cam_origin, oracle_args = res
        _g_pixel, g_output, _g_f, _g_valid = grads
        # dE_pos[e, endpoint, :] = (-Nx, -Ny) * f_e * g_e for both endpoints
        # (reference DiffRender.py:236-242, 263-267).
        scale = (f * g_output)[:, None, None]
        dE = jnp.broadcast_to((-N)[:, None, :], (N.shape[0], 2, 2)) * scale
        zeros = jax.tree_util.tree_map(jnp.zeros_like, (camera, cam_origin,
                                                        oracle_args))
        return (dE, *zeros)

    sample.defvjp(fwd, bwd)
    return sample


def primary_visibility(mesh, camera: CameraM, cam_origin,
                       intersect_fn: Callable, budget: int,
                       resy: int, resx: int,
                       detach_depth: bool = True) -> EdgeSamples:
    """Select up to `budget` silhouette edges, project their endpoints, and
    run the edge sampler (reference primary_visibility, DiffRender.py:459-479,
    including the viewport clip at :478)."""
    silh = silhouette_edge_mask(
        mesh.vertices, mesh.faces, mesh.edge_faces, mesh.edge_valid,
        cam_origin)
    silh_count = jnp.sum(silh)
    (edge_idx,) = jnp.nonzero(silh, size=budget, fill_value=0)
    sel_valid = jnp.arange(budget) < silh_count

    ev = mesh.edges[edge_idx]                          # [K,2] vertex indices
    V = mesh.vertices[ev.reshape(-1)]                  # [2K,3]
    pix = project_vertices(camera, V, detach_depth=detach_depth)
    E_pos = pix.reshape(budget, 2, 2)

    sampler = make_edge_sampler(intersect_fn)
    oracle_args = (mesh.vertices, mesh.faces, mesh.face_valid)
    pixel, output, _f, bc_valid = sampler(E_pos, camera, cam_origin,
                                          oracle_args)

    in_view = ((pixel[:, 0] >= 0) & (pixel[:, 0] < resx - 1)
               & (pixel[:, 1] >= 0) & (pixel[:, 1] < resy - 1))
    valid = sel_valid & bc_valid & in_view
    # Clamp so invalid lanes still index safely when gathering the mask image.
    pixel = jnp.clip(pixel, 0, jnp.array([resx - 1, resy - 1], jnp.int32))
    pixel_f = jax.lax.stop_gradient(jnp.mean(E_pos, axis=1))   # midpoint
    return EdgeSamples(pixel, pixel_f, output, valid, silh_count)
