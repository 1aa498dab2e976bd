"""Pinhole camera ray generation, including the supersampled variant used
by the BASELINE config-5 workload (high-res tiger, 4x supersampled rays).

Reference conventions under test: captured_data.py:23-40 (integer pixel
centers, K^-1 then R^-1 back-projection, origin = camera center).
"""

import numpy as np
import jax.numpy as jnp

from drt_tpu.data.synthetic import intrinsics, look_at_extrinsic
from drt_tpu.render.camera import CameraM, generate_rays, project_vertices


def _camera(resy=12, resx=16):
    R = look_at_extrinsic([120.0, 30.0, 40.0], [0.0, 0.0, 0.0])
    K = intrinsics(resy, resx, 45.0)
    f32 = lambda a: jnp.asarray(a, jnp.float32)  # noqa: E731
    return CameraM(f32(R), f32(K), f32(np.linalg.inv(R)),
                   f32(np.linalg.inv(K)))


def test_supersample_one_is_pixel_centers():
    """s=1 must reproduce the reference's integer pixel-center grid
    bit-for-bit ((i + 0.5)/1 - 0.5 == i exactly in float32)."""
    cam = _camera()
    o1, d1 = generate_rays(12, 16, cam)
    o2, d2 = generate_rays(12, 16, cam, supersample=1)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    # round-trip: projecting a point along ray (y,x) lands on pixel (x,y)
    p = np.asarray(o1[0]) + 7.0 * np.asarray(d1)        # points on the rays
    pix = np.asarray(project_vertices(cam, jnp.asarray(p)))
    yy, xx = np.meshgrid(np.arange(12), np.arange(16), indexing="ij")
    np.testing.assert_allclose(pix[:, 0], xx.ravel(), atol=2e-3)
    np.testing.assert_allclose(pix[:, 1], yy.ravel(), atol=2e-3)


def test_supersample_two_brackets_pixel_centers():
    resy, resx, s = 12, 16, 2
    cam = _camera(resy, resx)
    o, d = generate_rays(resy, resx, cam, supersample=s)
    assert d.shape == (resy * resx * s * s, 3)
    assert o.shape == d.shape
    # every sub-ray projects to its pixel's 2x2 sub-grid at +-0.25
    p = np.asarray(o[0]) + 7.0 * np.asarray(d)
    pix = np.asarray(project_vertices(cam, jnp.asarray(p)))
    fine = pix.reshape(resy * s, resx * s, 2)
    for sy in range(s):
        for sx in range(s):
            sub = fine[sy::s, sx::s]                     # [resy,resx,2]
            yy, xx = np.meshgrid(np.arange(resy), np.arange(resx),
                                 indexing="ij")
            np.testing.assert_allclose(sub[..., 0], xx + (sx + 0.5) / s - 0.5,
                                       atol=2e-3)
            np.testing.assert_allclose(sub[..., 1], yy + (sy + 0.5) / s - 0.5,
                                       atol=2e-3)


def test_supersample_average_recovers_center_ray():
    """The s^2 sub-rays of a pixel average (after renormalization) to that
    pixel's center ray to sub-pixel angular tolerance."""
    resy, resx, s = 8, 10, 2
    cam = _camera(resy, resx)
    _, d1 = generate_rays(resy, resx, cam)
    _, d2 = generate_rays(resy, resx, cam, supersample=s)
    fine = np.asarray(d2).reshape(resy, s, resx, s, 3)
    mean = fine.mean(axis=(1, 3))
    mean /= np.linalg.norm(mean, axis=-1, keepdims=True)
    cos = np.sum(mean.reshape(-1, 3) * np.asarray(d1), axis=-1)
    assert cos.min() > 1.0 - 1e-6
