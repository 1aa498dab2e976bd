"""Capture container utilities: downsampling a cached capture."""

import numpy as np
import jax.numpy as jnp

from drt_tpu.data import synthesize_capture
from drt_tpu.data.views import downsample_capture
from tests.meshes import make_icosphere


def test_downsample_capture_matches_pixel_grid():
    gt_v, gt_f = make_icosphere(subdivisions=2, radius=50.0)
    cap = synthesize_capture(gt_v, gt_f, name="sphere_ds", num_views=3,
                             resy=32, resx=48, ior=1.5, backend="brute",
                             num_view_used=3)
    sub = downsample_capture(cap, 2)
    assert (sub.resy, sub.resx) == (16, 24)

    v, s = cap.views, sub.views
    # every subsampled ray is the (2i,2j) ray of the full grid
    full_dirs = np.asarray(v.ray_dir).reshape(3, 32, 48, 3)
    sub_dirs = np.asarray(s.ray_dir).reshape(3, 16, 24, 3)
    np.testing.assert_array_equal(sub_dirs, full_dirs[:, ::2, ::2])
    full_valid = np.asarray(v.valid).reshape(3, 32, 48)
    np.testing.assert_array_equal(np.asarray(s.valid).reshape(3, 16, 24),
                                  full_valid[:, ::2, ::2])
    np.testing.assert_array_equal(np.asarray(s.mask),
                                  np.asarray(v.mask)[:, ::2, ::2])

    # intrinsics scale exactly: projecting any camera-space point with K'
    # gives u/k, v/k
    p = jnp.asarray([0.3, -0.2, 1.7])
    for view in range(3):
        uvw = np.asarray(v.K[view] @ p)
        uvw_sub = np.asarray(s.K[view] @ p)
        np.testing.assert_allclose(uvw_sub[:2], uvw[:2] / 2.0, rtol=1e-6)
        np.testing.assert_allclose(uvw_sub[2], uvw[2], rtol=1e-6)
    # K_inv really is the inverse of the scaled K
    eye = np.asarray(s.K[0] @ s.K_inv[0])
    np.testing.assert_allclose(eye, np.eye(3), atol=1e-5)
