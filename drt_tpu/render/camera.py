"""Pinhole camera model: ray generation and vertex projection.

Mirrors the reference's conventions exactly:
- `generate_ray` (captured_data.py:23-40): back-project the full pixel grid
  with K^-1 then R^-1; ray origin is the camera center R^-1[:3,3].
- `project_vert` / the projection inside `primary_visibility`
  (DiffRender.py:459-490): world -> camera via the 4x4 "cam_proj" R, then K.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from drt_tpu.geometry.vec import safe_normalize

# TPU f32 matmuls default to one-pass bf16 on the MXU; at pixel-coordinate
# magnitudes (~10^3) that rounds projections by multiple pixels. All camera
# matmuls force the full-precision algorithm (they are tiny [N,3]@[3,3] ops;
# the cost is nil, the silhouette loss depends on sub-pixel alignment).
_PMAT = jax.lax.Precision.HIGHEST


def _mm(a, b):
    return jnp.matmul(a, b, precision=_PMAT)


class CameraM(NamedTuple):
    """Camera matrices, as the reference's camera_M tuple
    (captured_data.py:58)."""
    R: jnp.ndarray          # [4,4] world->camera extrinsic ("cam_proj")
    K: jnp.ndarray          # [3,3] intrinsics
    R_inv: jnp.ndarray      # [4,4]
    K_inv: jnp.ndarray      # [3,3]


def generate_rays(resy: int, resx: int, camera: CameraM,
                  supersample: int = 1):
    """Back-project every pixel. Returns (origin [N,3], dir [N,3] unit),
    N = resy*resx*supersample², pixel (x,y) at row-major index y*resx + x
    when supersample == 1. Reference: captured_data.py:23-40 (note: pixel
    centers at integer coordinates, z=1 plane, matching the reference).

    supersample > 1 emits an s×s sub-pixel grid per pixel (the BASELINE
    config-5 "4× supersampled rays" workload): sub-pixel coordinates
    (i + 0.5)/s − 0.5 along each axis, so s=1 reproduces the integer pixel
    centers bit-for-bit and the s² sub-rays of pixel (y,x) average to its
    center. Row-major over the fine (resy·s × resx·s) grid: the sub-rays of
    pixel (y,x) sit at fine rows s·y..s·y+s−1, fine cols s·x..s·x+s−1."""
    K_inv = camera.K_inv
    R_inv = camera.R_inv
    dtype = K_inv.dtype
    s = int(supersample)
    ys = (jnp.arange(resy * s, dtype=dtype) + 0.5) / s - 0.5
    xs = (jnp.arange(resx * s, dtype=dtype) + 0.5) / s - 0.5
    py, px = jnp.meshgrid(ys, xs, indexing="ij")
    pz = jnp.ones_like(py)
    pixel = jnp.stack([px, py, pz], axis=2).reshape(-1, 3)    # [N,3]
    cam_p = _mm(pixel, K_inv.T)                                # [N,3]
    world_p = _mm(cam_p, R_inv[:3, :3].T) + R_inv[:3, 3]
    origin = R_inv[:3, 3]
    ray_dir = safe_normalize(world_p - origin)
    return jnp.broadcast_to(origin, ray_dir.shape), ray_dir


def project_vertices(camera: CameraM, V: jnp.ndarray,
                     detach_depth: bool = False):
    """Project world points to pixel coordinates [N,2] (float).

    Reference: the projection block of primary_visibility
    (DiffRender.py:466-474) and project_vert (DiffRender.py:481-490).
    detach_depth stops gradient through the camera-space depth, as the
    reference does for the silhouette loss (DiffRender.py:471)."""
    ones = jnp.ones((*V.shape[:-1], 1), dtype=V.dtype)
    v_h = jnp.concatenate([V, ones], axis=-1)                  # [N,4]
    v_cam = _mm(v_h, camera.R.T)                                # [N,4]
    if detach_depth:
        v_cam = v_cam.at[..., 2].set(jax.lax.stop_gradient(v_cam[..., 2]))
    v_pix = _mm(v_cam[..., :3], camera.K.T)                     # [N,3]
    return v_pix[..., :2] / v_pix[..., 2:3]
