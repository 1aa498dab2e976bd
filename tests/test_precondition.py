"""Sobolev preconditioning (optimize/precondition.py) and the optimizer
variants of make_train_step."""

import jax
import jax.numpy as jnp
import numpy as np

from drt_tpu.mesh import build_mesh_state
from drt_tpu.optimize.precondition import (
    laplacian_matvec, sobolev_apply, sobolev_solve,
)
from tests.meshes import make_icosphere


def _mesh():
    v, f = make_icosphere(subdivisions=2, radius=10.0)
    return build_mesh_state(v, f)


def test_laplacian_annihilates_constants():
    ms = _mesh()
    x = jnp.ones_like(ms.vertices) * jnp.asarray([1.0, -2.0, 3.0])
    lx = laplacian_matvec(x, ms.neighbors, ms.neighbor_valid)
    np.testing.assert_allclose(np.asarray(lx), 0.0, atol=1e-5)


def test_solve_inverts_apply():
    ms = _mesh()
    v = ms.vertices
    u = sobolev_apply(v, ms.neighbors, ms.neighbor_valid, 19.0)
    v_back = sobolev_solve(u, ms.neighbors, ms.neighbor_valid, 19.0,
                           maxiter=256, tol=1e-10)
    np.testing.assert_allclose(np.asarray(v_back), np.asarray(v),
                               rtol=1e-4, atol=1e-4)


def test_solve_is_differentiable_and_symmetric():
    ms = _mesh()
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.normal(size=ms.vertices.shape), jnp.float32)
    w = jnp.asarray(rng.normal(size=ms.vertices.shape), jnp.float32)

    def f(u_):
        v = sobolev_solve(u_, ms.neighbors, ms.neighbor_valid, 9.0,
                          maxiter=128, tol=1e-9)
        return jnp.sum(v * w)

    g = jax.grad(f)(u)
    # A symmetric => d/du <A^-1 u, w> = A^-1 w
    expect = sobolev_solve(w, ms.neighbors, ms.neighbor_valid, 9.0,
                           maxiter=128, tol=1e-9)
    np.testing.assert_allclose(np.asarray(g), np.asarray(expect),
                               rtol=1e-3, atol=1e-4)


def test_precond_amplifies_smooth_modes():
    """The preconditioned gradient keeps the smooth (translation-like)
    component of a noisy gradient and suppresses per-vertex noise."""
    ms = _mesh()
    rng = np.random.default_rng(1)
    smooth = np.tile([[0.0, 0.0, 1.0]], (ms.vertices.shape[0], 1))
    noise = rng.normal(size=ms.vertices.shape)
    g = jnp.asarray(smooth + noise, jnp.float32)
    pg = sobolev_solve(g, ms.neighbors, ms.neighbor_valid, 29.0,
                       maxiter=256, tol=1e-9)
    pg = np.asarray(pg)[: ms.num_vertices]
    # the z-mean (smooth mode) passes through unchanged...
    assert abs(pg[:, 2].mean() - (smooth + noise)[: ms.num_vertices, 2].mean()) < 0.05
    # ...while the per-vertex noise around it is strongly damped
    resid = pg - smooth[: ms.num_vertices]
    assert resid.std() < 0.3 * noise[: ms.num_vertices].std()


def test_train_step_variants_run_and_descend():
    from drt_tpu.config import HyperParams
    from drt_tpu.data import synthesize_capture
    from drt_tpu.intersect import get_intersect_fn
    from drt_tpu.optimize.loop import make_train_step
    from drt_tpu.optimize.losses import LossWeights

    gt_v, gt_f = make_icosphere(subdivisions=2, radius=50.0)
    cap = synthesize_capture(gt_v, gt_f, num_views=4, resy=16, resx=16,
                             ior=1.5, backend="brute", num_view_used=4)
    v0, f0 = make_icosphere(subdivisions=1, radius=45.0)
    ms = build_mesh_state(v0, f0)
    hp = HyperParams()
    weights = LossWeights(ray_w=hp.ray_w, vh_w=hp.vh_w, sm_w=hp.sm_w,
                          ior=1.5, ext_ior=hp.ext_ior)

    for optimizer, precond in [("sgd", "none"), ("adam", "none"),
                               ("uadam", "sobolev")]:
        init_state, step, final = make_train_step(
            get_intersect_fn("brute"), weights, 16, 16,
            silhouette_budget=128, optimizer=optimizer, precond=precond,
            precond_lambda=9.0, cg_iters=32)
        state = init_state(ms)
        ray_idx = jnp.asarray(0, jnp.int32)
        silh_idx = jnp.asarray([0, 1, 2, 3, 0, 1, 2, 3], jnp.int32)
        losses = []
        for _ in range(5):
            state, loss, aux = step(state, jnp.asarray(0.02, jnp.float32),
                                    ms, cap.views, ray_idx, silh_idx)
            losses.append(float(loss))
        assert np.isfinite(losses).all(), (optimizer, precond)
        v_out = final(state, ms)
        assert np.isfinite(np.asarray(v_out)).all()
        if optimizer == "sgd":
            # reference dynamics: repeated same-view steps reduce the loss.
            # (Adam variants take fixed-size steps; 5 steps at this tiny
            # scale are not guaranteed monotone — convergence quality is
            # validated end-to-end by the suite instead.)
            assert losses[-1] < losses[0], (optimizer, precond, losses)
