"""Loader for the reference's h5 capture files.

Schema (reference captured_data.py:99-108, 141-148):
  cam_proj [72,4,4]        world->camera extrinsics
  cam_k    [3,3]           shared intrinsics
  screen_position [72,N,3] environment-matting target per pixel
  mask     [72,resy,resx]  binary silhouette
  ray_origin/ray_dir [72,N,3]  (Pointgray captures only; Redmi rays are
                                computed from K,R — captured_data.py:149)

The capture files themselves are not vendored upstream (.gitignore); this
loader exists for users who have them. Camera rig assignment and resolutions:
reference optim.py:133-134, captured_data.py:90-91,131-132.
"""

from __future__ import annotations

import numpy as np

from drt_tpu.config import POINTGRAY_OBJECTS, POINTGRAY_RES, REDMI_OBJECTS, REDMI_RES
from drt_tpu.data.masks import process_mask
from drt_tpu.data.views import CaptureData, stack_views


def load_h5_capture(path: str, name: str, num_view_used: int = 72,
                    num_views: int = 72) -> CaptureData:
    import h5py

    if name in POINTGRAY_OBJECTS:
        resy, resx = POINTGRAY_RES
        has_rays = True
    elif name in REDMI_OBJECTS:
        resy, resx = REDMI_RES
        has_rays = False
    else:
        raise ValueError(f"unknown object {name!r}")

    views = []
    with h5py.File(path, "r") as h5:
        K = np.asarray(h5["cam_k"][:])
        for i in range(num_views):
            R = np.asarray(h5["cam_proj"][i])
            screen_pixel = np.asarray(h5["screen_position"][i]).reshape(-1, 3)
            mask = process_mask(np.asarray(h5["mask"][i]))
            valid = screen_pixel[:, 0] != 0
            if has_rays:
                origin = np.asarray(h5["ray_origin"][i]).reshape(-1, 3)
                ray_dir = np.asarray(h5["ray_dir"][i]).reshape(-1, 3)
            else:
                from drt_tpu.render.camera import CameraM, generate_rays
                import jax.numpy as jnp
                R_inv = np.linalg.inv(R)
                K_inv = np.linalg.inv(K)
                cam = CameraM(jnp.asarray(R), jnp.asarray(K),
                              jnp.asarray(R_inv), jnp.asarray(K_inv))
                o, d = generate_rays(resy, resx, cam)
                origin, ray_dir = np.asarray(o), np.asarray(d)
            views.append(dict(screen_pixel=screen_pixel, valid=valid,
                              mask=mask, origin=origin, ray_dir=ray_dir,
                              R=R, K=K))

    return CaptureData(name=name, resy=resy, resx=resx, num_views=num_views,
                       views=stack_views(views), num_view_used=num_view_used)
