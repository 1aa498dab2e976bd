"""Minimum end-to-end slice (SURVEY.md §7, BASELINE.json config 1 analog):
synthesize a small capture of a known shape, then optimize a perturbed
initial mesh against it and assert the loss decreases and geometry improves.
CPU, brute-force oracle, small resolution."""

import numpy as np
import pytest

from drt_tpu.config import HyperParams
from drt_tpu.data import synthesize_capture
from drt_tpu.optimize import optimize
from tests.meshes import make_icosphere


# Reference-scale radius: the reference's constants (grad clamp +-1,
# lr 0.1, 1e-5 ray offset, remesh lengths 10->1) are tuned for meshes
# ~50-100 units across (see data/*.ply), so tests match that scale.
RADIUS = 50.0


@pytest.fixture(scope="module")
def sphere_capture():
    gt_v, gt_f = make_icosphere(subdivisions=3, radius=RADIUS)
    return synthesize_capture(
        gt_v, gt_f, name="sphere", num_views=12, resy=48, resx=48,
        ior=1.5, backend="brute", num_view_used=12)


def test_synthetic_capture_sanity(sphere_capture):
    d = sphere_capture
    mask = np.asarray(d.views.mask)
    assert mask.shape == (12, 48, 48)
    # object visible in every view, roughly centered
    for v in range(12):
        assert mask[v].max() == 1.0
        assert 0.05 < (mask[v] > 0.5).mean() < 0.8
    valid = np.asarray(d.views.valid)
    assert valid.any(axis=1).all()
    # valid targets sit on the screen plane, not at the origin
    sp = np.asarray(d.views.screen_pixel)
    assert np.abs(sp[valid]).max() > RADIUS


def test_optimization_improves_mesh(sphere_capture):
    """Optimize a radially perturbed sphere toward the true sphere."""
    rng = np.random.default_rng(7)
    v0, f0 = make_icosphere(subdivisions=2, radius=RADIUS)
    # radial bumps up to 12%
    bump = 1.0 + 0.12 * rng.standard_normal(len(v0))[:, None]
    v_init = v0 * np.clip(bump, 0.85, 1.15)

    hp = HyperParams(
        name="sphere", ior=1.5, num_passes=1, iters=100,
        ray_w=40.0, vh_w=2e-3, sm_w=0.08,
        start_lr=0.1, lr_decay=1.0, backend="brute",
        silhouette_budget=512, num_view=12,
    )

    losses = []
    optimized = optimize(hp, sphere_capture, v_init, f0,
                         remesh_fn=None, checkpoint_dir=None,
                         log_fn=lambda s: losses.append(s), log_every=1)

    v_out, _ = optimized.host_arrays()
    r_before = np.abs(np.linalg.norm(v_init, axis=1) - RADIUS).mean()
    r_after = np.abs(np.linalg.norm(v_out, axis=1) - RADIUS).mean()
    # radial error shrinks
    assert r_after < 0.8 * r_before, (r_before, r_after)

    # loss decreased from first to last logged iteration
    import re
    vals = [float(re.search(r"loss=([\d.eE+-]+)", s).group(1))
            for s in losses if "loss=" in s]
    assert len(vals) >= 2
    assert vals[-1] < vals[0]
