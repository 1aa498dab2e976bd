"""Synthetic capture generator.

The reference's `.h5` capture files (camera matrices, environment-matting
screen positions, silhouette masks — schema at captured_data.py:99-108) are
gitignored upstream and not vendored. To get end-to-end optimization runs and
tests without that download, this module *renders* a synthetic capture from a
known ground-truth mesh: a ring of pinhole cameras around the object, a
virtual background screen plane behind it, and our own 2-bounce tracer
producing the exact environment-matting observation the real rig measures
(which screen point each camera pixel sees through the glass).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from drt_tpu.data.masks import process_mask
from drt_tpu.data.views import CaptureData, stack_views
from drt_tpu.intersect import get_intersect_fn
from drt_tpu.mesh import build_mesh_state
from drt_tpu.render import render_transparent, render_mask
from drt_tpu.render.camera import CameraM, generate_rays


def look_at_extrinsic(cam_pos, target, up=(0.0, 0.0, 1.0)):
    """4x4 world->camera matrix, camera +z looking at `target`
    (the reference's 'cam_proj' convention: pixel = K @ (R @ [p;1])[:3])."""
    cam_pos = np.asarray(cam_pos, dtype=np.float64)
    target = np.asarray(target, dtype=np.float64)
    up = np.asarray(up, dtype=np.float64)
    z = target - cam_pos
    z /= np.linalg.norm(z)
    x = np.cross(z, up)
    if np.linalg.norm(x) < 1e-9:            # looking along up
        x = np.cross(z, np.array([1.0, 0.0, 0.0]))
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    Rm = np.stack([x, y, z])                 # rows
    t = -Rm @ cam_pos
    R4 = np.eye(4)
    R4[:3, :3] = Rm
    R4[:3, 3] = t
    return R4


def intrinsics(resy, resx, fov_deg=45.0):
    f = 0.5 * resx / np.tan(np.deg2rad(fov_deg) / 2)
    return np.array([[f, 0.0, resx / 2.0],
                     [0.0, f, resy / 2.0],
                     [0.0, 0.0, 1.0]])


def synthesize_capture(
    gt_vertices: np.ndarray,
    gt_faces: np.ndarray,
    name: str = "synthetic",
    num_views: int = 72,
    resy: int = 128,
    resx: int = 128,
    ior: float = 1.4723,
    ext_ior: float = 1.00029,
    cam_distance_factor: float = 3.5,
    screen_distance_factor: float = 2.5,
    fov_deg: float = 45.0,
    elevation_deg: float = 10.0,
    backend: str = "auto",
    num_view_used: int = 72,
    cache_path: str | None = None,
) -> CaptureData:
    """Render a synthetic environment-matting capture of `gt` and return it
    in the same per-view structure the h5 loader produces.

    cache_path: optional .npz path — loaded if it exists, written after
    synthesis otherwise (rendering a high-res capture takes minutes)."""
    import os

    if cache_path and os.path.exists(cache_path):
        z = np.load(cache_path)
        views = [dict(screen_pixel=z[f"sp{i}"], valid=z[f"va{i}"],
                      mask=z[f"mk{i}"], origin=z[f"or{i}"],
                      ray_dir=z[f"rd{i}"], R=z[f"R{i}"], K=z[f"K{i}"])
                 for i in range(int(z["num_views"]))]
        return CaptureData(name=name, resy=int(z["resy"]),
                           resx=int(z["resx"]),
                           num_views=int(z["num_views"]),
                           views=stack_views(views),
                           num_view_used=num_view_used)
    center = gt_vertices.mean(axis=0)
    radius = float(np.linalg.norm(gt_vertices - center, axis=1).max())
    cam_dist = cam_distance_factor * radius
    screen_dist = screen_distance_factor * radius

    ms = build_mesh_state(gt_vertices, gt_faces)
    fn = get_intersect_fn(backend)
    K = intrinsics(resy, resx, fov_deg)

    @jax.jit
    def render_view(R, R_inv, K_j, K_inv, screen_point, screen_normal):
        cam = CameraM(R, K_j, R_inv, K_inv)
        origin, ray_dir = generate_rays(resy, resx, cam)
        res = render_transparent(origin, ray_dir, ms, fn, ior, ext_ior)
        # Intersect exit rays with the screen plane.
        denom = jnp.sum(res.direction * screen_normal, axis=1)
        denom_safe = jnp.where(jnp.abs(denom) > 1e-9, denom, 1e-9)
        t = jnp.sum((screen_point - res.origin) * screen_normal, axis=1) / denom_safe
        pt = res.origin + t[:, None] * res.direction
        valid = res.valid & (t > 0) & (jnp.abs(denom) > 1e-9)
        screen_pixel = jnp.where(valid[:, None], pt, 0.0)
        mask_img = render_mask(origin, ray_dir, ms, fn).reshape(resy, resx)
        return screen_pixel, valid, mask_img, origin, ray_dir

    views = []
    elev = np.deg2rad(elevation_deg)
    for i in range(num_views):
        th = 2 * np.pi * i / num_views
        cam_pos = center + cam_dist * np.array(
            [np.cos(th) * np.cos(elev), np.sin(th) * np.cos(elev), np.sin(elev)])
        R = look_at_extrinsic(cam_pos, center)
        R_inv = np.linalg.inv(R)
        z_cam = R[2, :3]                       # camera viewing direction
        screen_point = center + screen_dist * z_cam
        screen_normal = -z_cam                 # facing the camera

        sp, valid, mask_img, origin, ray_dir = render_view(
            jnp.asarray(R, jnp.float32), jnp.asarray(R_inv, jnp.float32),
            jnp.asarray(K, jnp.float32), jnp.asarray(np.linalg.inv(K), jnp.float32),
            jnp.asarray(screen_point, jnp.float32),
            jnp.asarray(screen_normal, jnp.float32))

        binary = np.asarray(mask_img > 0.5).astype(np.uint8)
        views.append(dict(
            screen_pixel=np.asarray(sp),
            valid=np.asarray(valid),
            mask=process_mask(binary),
            origin=np.asarray(origin),
            ray_dir=np.asarray(ray_dir),
            R=R, K=K,
        ))

    if cache_path:
        os.makedirs(os.path.dirname(os.path.abspath(cache_path)),
                    exist_ok=True)
        payload = {"num_views": num_views, "resy": resy, "resx": resx}
        for i, vw in enumerate(views):
            payload.update({f"sp{i}": vw["screen_pixel"], f"va{i}": vw["valid"],
                            f"mk{i}": vw["mask"], f"or{i}": vw["origin"],
                            f"rd{i}": vw["ray_dir"], f"R{i}": vw["R"],
                            f"K{i}": vw["K"]})
        np.savez_compressed(cache_path, **payload)

    return CaptureData(
        name=name, resy=resy, resx=resx, num_views=num_views,
        views=stack_views(views), num_view_used=num_view_used,
    )
