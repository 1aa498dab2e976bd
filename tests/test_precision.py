"""f32-vs-f64 drift validation (SURVEY.md §7 build plan item 1: "validate
f32-vs-f64 drift in tests"). The reference runs its autograd in float64
(DiffRender.py:19); this framework runs float32 on TPU with stabilizers.
These tests quantify the drift on the full differentiable pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drt_tpu.geometry.vec import safe_normalize
from drt_tpu.intersect import get_intersect_fn
from drt_tpu.mesh import build_mesh_state
from drt_tpu.render import render_transparent
from tests.meshes import make_icosphere


@pytest.fixture(scope="module")
def setup():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


def _pipeline(dtype, setup_rays):
    v, f = make_icosphere(subdivisions=3, radius=50.0)
    ms = build_mesh_state(v, f, dtype=dtype)
    fn = get_intersect_fn("brute")
    o, d, sp = setup_rays(dtype)

    def loss(verts):
        m = ms.with_vertices(verts)
        res = render_transparent(o, d, m, fn, 1.4723, 1.00029)
        target = safe_normalize(sp - jax.lax.stop_gradient(res.origin))
        diff = res.direction - target
        return jnp.sum(jnp.where(res.valid[:, None], diff * diff, 0.0))

    val, grad = jax.value_and_grad(loss)(ms.vertices)
    fwd = render_transparent(o, d, ms, fn, 1.4723, 1.00029)
    return np.asarray(fwd.direction), float(val), np.asarray(grad)


def test_f32_matches_f64(setup):
    def rays(dtype):
        n = 24
        xs = np.linspace(-30, 30, n)
        o = jnp.asarray([[x, y, -200.0] for x in xs for y in xs], dtype)
        d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], dtype), o.shape)
        sp = jnp.asarray([0.0, 0.0, 150.0], dtype)
        return o, d, sp

    dir32, val32, g32 = _pipeline(jnp.float32, rays)
    dir64, val64, g64 = _pipeline(jnp.float64, rays)

    # validity must agree between precisions (the scale-aware exit offset
    # exists precisely for this — an absolute 1e-5 lost ~35% of f32 rays
    # to self-occlusion acne at 100-unit coordinates)
    valid32 = np.linalg.norm(dir32, axis=1) > 0.5
    valid64 = np.linalg.norm(dir64, axis=1) > 0.5
    assert (valid32 != valid64).mean() < 0.01
    mask = valid32 & valid64
    err = np.abs(dir32[mask] - dir64[mask]).max(axis=1)
    assert np.quantile(err, 0.95) < 1e-4, np.quantile(err, 0.95)
    assert np.median(err) < 2e-5
    # loss value relative drift
    assert abs(val32 - val64) / max(abs(val64), 1e-12) < 1e-3
    # gradient direction: cosine similarity of flattened grads
    num = float((g32.astype(np.float64) * g64).sum())
    den = np.linalg.norm(g32) * np.linalg.norm(g64)
    assert num / den > 0.999, num / den
