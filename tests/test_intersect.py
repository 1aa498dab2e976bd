"""Hit-oracle tests: brute-force backend vs analytic geometry, and the
oracle/differentiable split (gradients never flow through the oracle)."""

import jax
import jax.numpy as jnp
import numpy as np

from drt_tpu.intersect import get_intersect_fn, intersect_brute
from drt_tpu.mesh import build_mesh_state
from tests.meshes import make_cube, make_icosphere


def sphere_rays(n, radius=3.0, rng=None):
    """Rays from a ring of origins aimed at perturbed points near origin."""
    rng = rng or np.random.default_rng(0)
    th = rng.uniform(0, 2 * np.pi, n)
    ph = rng.uniform(-1, 1, n)
    o = np.stack([np.cos(th) * np.cos(ph), np.sin(th) * np.cos(ph),
                  np.sin(ph)], 1) * radius
    tgt = rng.normal(scale=0.3, size=(n, 3))
    # keep targets well inside the unit sphere so every ray hits
    nrm = np.linalg.norm(tgt, axis=1, keepdims=True)
    tgt = tgt / np.maximum(nrm, 1e-9) * np.minimum(nrm, 0.5)
    d = tgt - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.array(o), jnp.array(d)


class TestBrute:
    def test_sphere_hit_distance(self):
        """Rays at a unit sphere: hit distance ~ dist(origin) - 1."""
        v, f = make_icosphere(subdivisions=3)
        ms = build_mesh_state(v, f)
        o, d = sphere_rays(256)
        hits = intersect_brute(o, d, ms.vertices, ms.faces, ms.face_valid)
        assert bool(hits.hit.all())
        t = np.asarray(hits.t)
        # exact ray-sphere intersection (unit sphere): smaller quadratic root
        on, dn = np.asarray(o), np.asarray(d)
        b = np.sum(on * dn, axis=1)
        c = np.sum(on * on, axis=1) - 1.0
        t_exact = -b - np.sqrt(b * b - c)
        # the faceted icosphere lies slightly inside the true sphere
        assert np.all(t >= t_exact - 1e-4)
        np.testing.assert_allclose(t, t_exact, atol=0.03)

    def test_miss(self):
        v, f = make_cube()
        ms = build_mesh_state(v, f)
        o = jnp.array([[3.0, 0.0, 0.0], [0.0, 3.0, 0.0]])
        d = jnp.array([[1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])  # away / parallel
        hits = intersect_brute(o, d, ms.vertices, ms.faces, ms.face_valid)
        assert not bool(hits.hit.any())
        assert bool(jnp.all(hits.tri_id == -1))
        assert bool(jnp.all(jnp.isinf(hits.t)))

    def test_cube_axis_hit(self):
        v, f = make_cube()  # unit cube centered at origin
        ms = build_mesh_state(v, f)
        o = jnp.array([[0.1, 0.2, -5.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        hits = intersect_brute(o, d, ms.vertices, ms.faces, ms.face_valid)
        np.testing.assert_allclose(float(hits.t[0]), 4.5, rtol=1e-6)

    def test_closest_of_two_surfaces(self):
        """A ray through a closed mesh must report the NEAR surface."""
        v, f = make_cube()
        ms = build_mesh_state(v, f)
        o = jnp.array([[0.0, 0.0, -5.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        hits = intersect_brute(o, d, ms.vertices, ms.faces, ms.face_valid)
        np.testing.assert_allclose(float(hits.t[0]), 4.5, rtol=1e-6)

    def test_t_min_skips_near_surface(self):
        v, f = make_cube()
        ms = build_mesh_state(v, f)
        o = jnp.array([[0.0, 0.0, -5.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        hits = intersect_brute(o, d, ms.vertices, ms.faces, ms.face_valid,
                               t_min=4.6)
        np.testing.assert_allclose(float(hits.t[0]), 5.5, rtol=1e-6)

    def test_inside_hits_far_wall(self):
        """From inside the cube, the exit surface is found (needed for
        bounce 2 of the refraction trace)."""
        v, f = make_cube()
        ms = build_mesh_state(v, f)
        o = jnp.array([[0.0, 0.0, 0.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        hits = intersect_brute(o, d, ms.vertices, ms.faces, ms.face_valid)
        np.testing.assert_allclose(float(hits.t[0]), 0.5, rtol=1e-6)

    def test_ray_padding_odd_counts(self):
        """Ray counts that don't divide the chunk size still work."""
        v, f = make_icosphere(subdivisions=1)
        ms = build_mesh_state(v, f)
        o, d = sphere_rays(77)
        hits = intersect_brute(o, d, ms.vertices, ms.faces, ms.face_valid,
                               ray_chunk=32, tri_chunk=16)
        hits2 = intersect_brute(o, d, ms.vertices, ms.faces, ms.face_valid)
        np.testing.assert_array_equal(np.asarray(hits.tri_id),
                                      np.asarray(hits2.tri_id))
        np.testing.assert_allclose(np.asarray(hits.t), np.asarray(hits2.t),
                                   rtol=1e-6)

    def test_padded_faces_never_hit(self):
        """Degenerate padded faces at the origin must not produce hits."""
        v, f = make_cube(center=(10.0, 0.0, 0.0))
        ms = build_mesh_state(v, f)
        # aim straight at the padding's location (origin)
        o = jnp.array([[0.0, 0.0, -5.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        hits = intersect_brute(o, d, ms.vertices, ms.faces, ms.face_valid)
        assert not bool(hits.hit.any())


class TestOracleAPI:
    def test_stop_gradient(self):
        """No gradient flows through the oracle's outputs (the reference's
        oracle split, SURVEY.md §1)."""
        v, f = make_cube()
        ms = build_mesh_state(v, f)
        fn = get_intersect_fn("brute")
        o = jnp.array([[0.0, 0.0, -5.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])

        def loss(verts):
            hits = fn(o, d, verts, ms.faces, ms.face_valid)
            return jnp.sum(jnp.where(hits.hit, hits.t, 0.0))

        g = jax.grad(loss)(ms.vertices)
        assert float(jnp.abs(g).sum()) == 0.0

    def test_jit(self):
        v, f = make_cube()
        ms = build_mesh_state(v, f)
        fn = jax.jit(get_intersect_fn("brute"))
        o = jnp.array([[0.0, 0.0, -5.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        hits = fn(o, d, ms.vertices, ms.faces, ms.face_valid)
        np.testing.assert_allclose(float(hits.t[0]), 4.5, rtol=1e-6)
