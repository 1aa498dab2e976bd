"""Reference-compatibility checks: the compat flag reproduces the
reference's exact Refract formula, and documented deviations are tested as
deviations (so parity claims stay honest)."""

import jax.numpy as jnp
import numpy as np

from drt_tpu.geometry import refract
from drt_tpu.geometry.laplacian import (
    laplacian_grad_hook, laplacian_normal_grad_hook,
)
from drt_tpu.mesh import build_mesh_state
from tests.meshes import make_icosphere


class TestRefractCompat:
    def test_compat_mode_formula(self):
        """compat mode computes cosThetaT = sqrt(1 - sin^2(theta_i)) — the
        reference's formula at DiffRender.py:42 — and renormalizes, exactly
        reproducing its output direction."""
        th = np.deg2rad(45.0)
        eta = 1.0 / 1.5
        wo = jnp.array([[np.sin(th), 0.0, np.cos(th)]])
        n = jnp.array([[0.0, 0.0, 1.0]])
        _, wt = refract(wo, n, eta, compat_cos_from_incident=True)

        # hand-evaluated reference formula
        cos_i = np.cos(th)
        cos_t_ref = np.sqrt(1 - np.sin(th) ** 2)  # = cos_i (the quirk)
        wt_ref = eta * -np.asarray(wo[0]) + (eta * cos_i - cos_t_ref) * \
            np.array([0.0, 0.0, 1.0])
        wt_ref /= np.linalg.norm(wt_ref)
        np.testing.assert_allclose(np.asarray(wt[0]), wt_ref, atol=1e-6)

    def test_modes_agree_at_normal_incidence(self):
        wo = jnp.array([[0.0, 0.0, 1.0]])
        n = jnp.array([[0.0, 0.0, 1.0]])
        _, a = refract(wo, n, 1 / 1.5, compat_cos_from_incident=False)
        _, b = refract(wo, n, 1 / 1.5, compat_cos_from_incident=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_modes_differ_off_axis(self):
        """The deviation is real: the reference formula does NOT satisfy
        Snell's law away from normal incidence (documented in vec.py)."""
        th = np.deg2rad(45.0)
        wo = jnp.array([[np.sin(th), 0.0, np.cos(th)]])
        n = jnp.array([[0.0, 0.0, 1.0]])
        _, correct = refract(wo, n, 1 / 1.5)
        _, compat = refract(wo, n, 1 / 1.5, compat_cos_from_incident=True)
        assert float(jnp.abs(correct - compat).max()) > 0.05
        # correct mode satisfies Snell; compat does not
        assert abs(abs(float(correct[0, 0])) - np.sin(th) / 1.5) < 1e-5
        assert abs(abs(float(compat[0, 0])) - np.sin(th) / 1.5) > 0.01


class TestLaplacianHooks:
    def test_hooks_shape_and_zero_weight(self):
        v, f = make_icosphere(subdivisions=1, radius=5.0)
        ms = build_mesh_state(v, f)
        g = jnp.ones_like(ms.vertices)
        out = laplacian_grad_hook(g, ms.vertices, ms.neighbors,
                                  ms.neighbor_valid, weight=0.0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(g))
        out2 = laplacian_grad_hook(g, ms.vertices, ms.neighbors,
                                   ms.neighbor_valid, weight=1.0)
        assert out2.shape == g.shape
        assert float(jnp.abs(out2 - g).sum()) > 0

    def test_normal_hook_threshold(self):
        v, f = make_icosphere(subdivisions=1, radius=5.0)
        ms = build_mesh_state(v, f)
        g = jnp.zeros((ms.vertices.shape[0], 1))
        out = laplacian_normal_grad_hook(
            g, ms.vertices, ms.normals, ms.neighbors, ms.neighbor_valid,
            weight=1.0, threshold=1e9)
        np.testing.assert_allclose(np.asarray(out), 0.0)
