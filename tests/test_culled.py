"""Culled (Plucker-matmul) backend vs the brute-force oracle: identical hits
(SURVEY.md §4: the brute intersector is the fake backend that validates
accelerated ones)."""

import jax.numpy as jnp
import numpy as np
import pytest

from drt_tpu.intersect.brute import intersect_brute
from drt_tpu.intersect.culled import intersect_culled
from drt_tpu.mesh import build_mesh_state, load_ply
from tests.meshes import make_cube, make_icosphere
from tests.test_intersect import sphere_rays


def assert_hits_match(h_ref, h_new, o, d, vertices, faces, rtol=1e-4):
    """tri ids may differ only where two triangles tie (shared edges);
    compare distances everywhere and ids where distances are unique."""
    t_ref = np.asarray(h_ref.t)
    t_new = np.asarray(h_new.t)
    hit_ref = np.asarray(h_ref.hit)
    hit_new = np.asarray(h_new.hit)
    np.testing.assert_array_equal(hit_ref, hit_new)
    m = hit_ref
    np.testing.assert_allclose(t_new[m], t_ref[m], rtol=rtol, atol=1e-4)


def scene_rays(n, orbit=170.0, target_spread=25.0, seed=0):
    rng = np.random.default_rng(seed)
    th = rng.uniform(0, 2 * np.pi, n)
    ph = rng.uniform(-0.8, 0.8, n)
    o = np.stack([np.cos(th) * np.cos(ph), np.sin(th) * np.cos(ph),
                  np.sin(ph)], 1) * orbit
    tgt = rng.uniform(-target_spread, target_spread, (n, 3))
    d = tgt - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32)


@pytest.mark.parametrize("mesh_fn,nrays", [
    (lambda: make_cube(size=80.0), 333),
    (lambda: make_icosphere(subdivisions=3, radius=50.0), 1024),
    (lambda: make_icosphere(subdivisions=4, radius=50.0), 2048),
])
def test_matches_brute(mesh_fn, nrays):
    v, f = mesh_fn()
    ms = build_mesh_state(v, f)
    o, d = scene_rays(nrays)
    hb = intersect_brute(o, d, ms.vertices, ms.faces, ms.face_valid)
    hc = intersect_culled(o, d, ms.vertices, ms.faces, ms.face_valid)
    assert_hits_match(hb, hc, o, d, ms.vertices, ms.faces)


def test_matches_brute_reference_mesh():
    """The real mouse visual hull (9246 faces, Morton-ordered chunks)."""
    v, f = load_ply("/root/reference/data/mouse_vh.ply")
    ms = build_mesh_state(v, f)
    center = v.mean(axis=0)
    radius = np.linalg.norm(v - center, axis=1).max()
    rng = np.random.default_rng(3)
    n = 2048
    th = rng.uniform(0, 2 * np.pi, n)
    o = center + radius * 3 * np.stack(
        [np.cos(th), np.sin(th), rng.uniform(-0.5, 0.5, n)], 1)
    tgt = center + rng.normal(scale=0.3 * radius, size=(n, 3))
    d = tgt - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o, d = jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32)

    hb = intersect_brute(o, d, ms.vertices, ms.faces, ms.face_valid)
    hc = intersect_culled(o, d, ms.vertices, ms.faces, ms.face_valid)
    # allow a tiny mismatch rate from near-edge eps differences
    hit_ref, hit_new = np.asarray(hb.hit), np.asarray(hc.hit)
    assert (hit_ref != hit_new).mean() < 2e-3
    both = hit_ref & hit_new
    np.testing.assert_allclose(np.asarray(hc.t)[both], np.asarray(hb.t)[both],
                               rtol=1e-3, atol=5e-3)


def test_inside_rays():
    """Second-bounce style rays: origins inside the object."""
    v, f = make_icosphere(subdivisions=3, radius=50.0)
    ms = build_mesh_state(v, f)
    rng = np.random.default_rng(5)
    o = jnp.asarray(rng.uniform(-20, 20, (512, 3)), jnp.float32)
    d = rng.normal(size=(512, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d, jnp.float32)
    hb = intersect_brute(o, d, ms.vertices, ms.faces, ms.face_valid)
    hc = intersect_culled(o, d, ms.vertices, ms.faces, ms.face_valid)
    assert bool(hc.hit.all())
    np.testing.assert_allclose(np.asarray(hc.t), np.asarray(hb.t),
                               rtol=1e-4, atol=1e-3)


def test_t_min():
    v, f = make_cube(size=80.0)
    ms = build_mesh_state(v, f)
    o = jnp.array([[0.0, 0.0, -400.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    h = intersect_culled(o, d, ms.vertices, ms.faces, ms.face_valid,
                         t_min=370.0)
    np.testing.assert_allclose(float(h.t[0]), 440.0, rtol=1e-5)
