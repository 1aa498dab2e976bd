"""Property tests for the differentiable math kernels (SURVEY.md §4:
pure math kernels validated against analytic cases)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drt_tpu.geometry import (
    dot3, reflect, refract, fresnel_dielectric, moller_trumbore,
    face_areas, area_var, edge_var, corner_angles_and_normals,
    dihedral_cos, vertex_normals,
)
from drt_tpu.geometry.laplacian import neighbor_average
from drt_tpu.mesh import build_mesh_state


def norm(v):
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


class TestVec:
    def test_dot3(self, rng):
        a = rng.normal(size=(10, 3))
        b = rng.normal(size=(10, 3))
        np.testing.assert_allclose(dot3(jnp.array(a), jnp.array(b)),
                                   np.sum(a * b, -1), rtol=1e-6)

    def test_reflect(self):
        wo = jnp.array([norm(np.array([1.0, 1.0, 0.0]))])
        n = jnp.array([[0.0, 1.0, 0.0]])
        r = reflect(wo, n)
        np.testing.assert_allclose(r, [norm(np.array([-1.0, 1.0, 0.0]))],
                                   atol=1e-7)

    def test_refract_normal_incidence(self):
        """At normal incidence the ray passes straight through."""
        wo = jnp.array([[0.0, 0.0, 1.0]])
        n = jnp.array([[0.0, 0.0, 1.0]])
        tir, wt = refract(wo, n, 1.0 / 1.5)
        assert not bool(tir[0])
        np.testing.assert_allclose(wt, [[0.0, 0.0, -1.0]], atol=1e-7)

    def test_refract_snells_law(self):
        """sin(theta_t) = eta * sin(theta_i) for the default (correct) mode."""
        for deg in [10.0, 30.0, 45.0, 60.0, 80.0]:
            th = np.deg2rad(deg)
            wo = jnp.array([[np.sin(th), 0.0, np.cos(th)]])
            n = jnp.array([[0.0, 0.0, 1.0]])
            eta = 1.0 / 1.5
            tir, wt = refract(wo, n, eta)
            assert not bool(tir[0])
            sin_t = float(jnp.abs(wt[0, 0]))
            np.testing.assert_allclose(sin_t, eta * np.sin(th), rtol=1e-5)
            # unit length
            np.testing.assert_allclose(float(jnp.linalg.norm(wt[0])), 1.0,
                                       rtol=1e-6)

    def test_refract_tir(self):
        """Beyond the critical angle (glass->air) refraction must flag TIR."""
        crit = np.arcsin(1.0 / 1.5)
        th = crit + 0.05
        wo = jnp.array([[np.sin(th), 0.0, np.cos(th)]])
        n = jnp.array([[0.0, 0.0, 1.0]])
        tir, _ = refract(wo, n, 1.5 / 1.0)
        assert bool(tir[0])
        # just below critical: refracts
        th = crit - 0.05
        wo = jnp.array([[np.sin(th), 0.0, np.cos(th)]])
        tir, _ = refract(wo, n, 1.5)
        assert not bool(tir[0])

    def test_fresnel_normal_incidence(self):
        """R(0) = ((n1-n2)/(n1+n2))^2."""
        n1, n2 = 1.0, 1.5
        tir, R = fresnel_dielectric(jnp.array([1.0]), n1, n2)
        expect = ((n1 - n2) / (n1 + n2)) ** 2
        assert not bool(tir[0])
        np.testing.assert_allclose(float(R[0]), expect, rtol=1e-6)

    def test_fresnel_grazing(self):
        """R -> 1 at grazing incidence."""
        _, R = fresnel_dielectric(jnp.array([1e-4]), 1.0, 1.5)
        np.testing.assert_allclose(float(R[0]), 1.0, atol=1e-3)

    def test_fresnel_tir_matches_refract_tir(self, rng):
        """The reference debug-asserts these two TIR flags agree
        (DiffRender.py:524-525)."""
        cos_i = jnp.array(rng.uniform(0.01, 1.0, size=64))
        eta_i, eta_t = 1.5, 1.0
        tir_f, _ = fresnel_dielectric(cos_i, eta_i, eta_t)
        # build wo/n with that cosine
        sin_i = jnp.sqrt(1 - cos_i**2)
        wo = jnp.stack([sin_i, jnp.zeros_like(cos_i), cos_i], axis=1)
        n = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), wo.shape)
        tir_r, _ = refract(wo, n, eta_i / eta_t)
        np.testing.assert_array_equal(np.asarray(tir_f), np.asarray(tir_r))


class TestMollerTrumbore:
    def test_plane_hit_analytic(self):
        """Closed-form hit on the unit triangle in the z=2 plane."""
        tri = jnp.array([[[0.0, 0.0, 2.0], [1.0, 0.0, 2.0], [0.0, 1.0, 2.0]]])
        o = jnp.array([[0.2, 0.3, 0.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        u, v, t, n = moller_trumbore(o, d, tri)
        np.testing.assert_allclose(float(t[0]), 2.0, rtol=1e-6)
        np.testing.assert_allclose(float(u[0]), 0.2, rtol=1e-5)
        np.testing.assert_allclose(float(v[0]), 0.3, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(n[0]), [0, 0, 1], atol=1e-6)

    def test_grad_t_wrt_vertices(self):
        """dt/dz of a translating triangle = 1 (hit distance tracks plane)."""
        o = jnp.array([[0.2, 0.3, 0.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])

        def t_of_z(z):
            tri = jnp.array([[[0.0, 0.0, 0.0], [1.0, 0.0, 0.0],
                              [0.0, 1.0, 0.0]]]) + jnp.array([0.0, 0.0, 1.0]) * z
            return moller_trumbore(o, d, tri)[2][0]

        g = jax.grad(t_of_z)(2.0)
        np.testing.assert_allclose(float(g), 1.0, rtol=1e-6)

    def test_degenerate_triangle_finite(self):
        """Masked/padded lanes with degenerate triangles stay finite."""
        tri = jnp.zeros((1, 3, 3))
        o = jnp.array([[0.0, 0.0, -1.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        u, v, t, n = moller_trumbore(o, d, tri)
        for x in (u, v, t, n):
            assert bool(jnp.all(jnp.isfinite(x)))


class TestMetrics:
    def test_face_areas(self):
        tri = jnp.array([[[0.0, 0, 0], [1, 0, 0], [0, 1, 0]]])
        # parallelogram norm (reference JIT_area omits the 1/2)
        np.testing.assert_allclose(float(face_areas(tri)[0]), 1.0, rtol=1e-6)

    def test_area_var_uniform_zero(self, icosphere):
        v, f = icosphere
        ms = build_mesh_state(v, f)
        av = area_var(ms.triangles, ms.face_valid)
        # icosphere faces are near-uniform; padded faces must not pollute
        assert float(av) < 0.02

    def test_edge_var_cube(self, cube_mesh):
        v, f = cube_mesh
        ms = build_mesh_state(v, f)
        ev = edge_var(ms.vertices, ms.edges, ms.edge_valid)
        # 12 edges length 1, 6 of sqrt(2): relative variance is known
        ln = np.array([1.0] * 12 + [np.sqrt(2)] * 6)
        expect = np.mean(((ln - ln.mean()) / ln.mean()) ** 2)
        np.testing.assert_allclose(float(ev), expect, rtol=1e-5)

    def test_dihedral_cube(self, cube_mesh):
        v, f = cube_mesh
        ms = build_mesh_state(v, f)
        cosd = np.asarray(dihedral_cos(ms.vertices, ms.faces, ms.edge_faces))
        cosd = cosd[: ms.num_edges]
        # cube: 12 edges with 90-degree normals (cos=0) + 6 flat diagonals
        # (cos=1)
        assert np.sum(np.abs(cosd - 1.0) < 1e-5) == 6
        assert np.sum(np.abs(cosd) < 1e-5) == 12

    def test_corner_angles_sum_to_pi(self, icosphere, rng):
        v, f = icosphere
        ms = build_mesh_state(v, f)
        angles, _ = corner_angles_and_normals(ms.triangles, ms.face_valid)
        sums = np.asarray(jnp.sum(angles, axis=1))[: ms.num_faces]
        np.testing.assert_allclose(sums, np.pi, rtol=1e-5)

    def test_vertex_normals_sphere(self, icosphere):
        v, f = icosphere
        ms = build_mesh_state(v, f)
        n = np.asarray(ms.normals)[: ms.num_vertices]
        radial = norm(v)
        assert np.sum(n * radial, axis=1).min() > 0.99

    def test_neighbor_average_sphere_shrinks(self, icosphere):
        """Neighbor average of a convex surface lies strictly inside."""
        v, f = icosphere
        ms = build_mesh_state(v, f)
        avg = np.asarray(neighbor_average(ms.vertices, ms.neighbors,
                                          ms.neighbor_valid))
        r = np.linalg.norm(avg[: ms.num_vertices], axis=1)
        assert np.all(r < 1.0)
        assert np.all(r > 0.8)
