"""Full LOD loop: multiple passes with in-process remeshing between them
(the reference's outer loop, optim.py:190-215) on the synthetic sphere."""

import numpy as np

from drt_tpu.config import HyperParams
from drt_tpu.data import synthesize_capture
from drt_tpu.optimize import optimize
from drt_tpu.remesh import hausdorff_distance
from tests.meshes import make_icosphere

RADIUS = 50.0


def test_lod_optimization_with_remesh(tmp_path):
    gt_v, gt_f = make_icosphere(subdivisions=3, radius=RADIUS)
    cap = synthesize_capture(gt_v, gt_f, name="sphere", num_views=12,
                             resy=48, resx=48, ior=1.5, backend="brute",
                             num_view_used=12)

    rng = np.random.default_rng(11)
    v0, f0 = make_icosphere(subdivisions=2, radius=RADIUS)
    bump = 1.0 + 0.10 * rng.standard_normal(len(v0))[:, None]
    v_init = v0 * np.clip(bump, 0.88, 1.12)

    hp = HyperParams(name="sphere", ior=1.5, num_passes=2, iters=50,
                     ray_w=40.0, vh_w=2e-3, sm_w=0.08,
                     start_lr=0.1, lr_decay=0.5,
                     start_len=12.0, end_len=8.0,
                     backend="brute", silhouette_budget=512, num_view=12)

    out = optimize(hp, cap, v_init, f0, remesh_fn="isotropic",
                   checkpoint_dir=str(tmp_path), log_fn=lambda s: None)

    v_out, f_out = out.host_arrays()
    # remesh actually changed the topology
    assert len(v_out) != len(v0)

    before = hausdorff_distance(v_init, f0, gt_v, gt_f)
    after = hausdorff_distance(v_out, f_out, gt_v, gt_f)
    assert after.mean < before.mean, (before, after)

    # per-pass checkpoints written (SURVEY.md §5 checkpoint capability)
    import os
    cks = sorted(os.listdir(tmp_path))
    assert cks == ["sphere_pass00.ply", "sphere_pass01.ply"]


def test_remesh_retry_keeps_mesh_on_persistent_failure():
    """A remesh that breaks watertightness must not kill a multi-hour run:
    the loop retries 0.8x finer, then keeps the current mesh for the pass
    (observed twice on long TPU runs; the reference would crash at
    optim.py:51)."""
    gt_v, gt_f = make_icosphere(subdivisions=2, radius=RADIUS)
    cap = synthesize_capture(gt_v, gt_f, name="sphere_retry", num_views=4,
                             resy=24, resx=24, ior=1.5, backend="brute",
                             num_view_used=4)
    hp = HyperParams(name="sphere_retry", ior=1.5, num_passes=1, iters=1,
                     start_len=12.0, end_len=8.0, backend="brute",
                     silhouette_budget=256, num_view=4)

    attempts = []

    def bad_remesh(v, f, target_len):
        attempts.append(target_len)
        raise ValueError("mesh is not watertight")

    lines = []
    out = optimize(hp, cap, gt_v, gt_f, remesh_fn=bad_remesh,
                   log_fn=lines.append)
    # retried once at 0.8x, then kept the input mesh and finished the pass
    assert attempts == [12.0, 12.0 * 0.8]
    assert any("keeping the current mesh" in ln for ln in lines)
    v_out, _ = out.host_arrays()
    assert len(v_out) == len(gt_v)


def test_silhouette_budget_guard_grows():
    """An undersized silhouette sampling budget must be detected (no silent
    truncation — VERDICT round-1 weak #4) and grown for the next pass."""
    gt_v, gt_f = make_icosphere(subdivisions=2, radius=RADIUS)
    cap = synthesize_capture(gt_v, gt_f, name="sphere_budget", num_views=4,
                             resy=24, resx=24, ior=1.5, backend="brute",
                             num_view_used=4)
    # an icosphere at subdiv 2 has ~hundreds of silhouette edges per view;
    # budget 8 is guaranteed to truncate
    hp = HyperParams(name="sphere_budget", ior=1.5, num_passes=2, iters=1,
                     start_len=12.0, end_len=8.0, backend="brute",
                     silhouette_budget=8, num_view=4)
    lines = []
    optimize(hp, cap, gt_v, gt_f, remesh_fn=None, log_fn=lines.append)
    warn = [ln for ln in lines if "exceeded the sampling budget" in ln]
    assert warn, lines
    assert "budget grows to" in warn[0]


def test_silh_max_carried_in_step_state():
    """The budget-overflow guard must observe EVERY iteration (VERDICT r4
    weak #4): the per-iter silhouette-edge max is carried as a running max
    inside the jitted step state, so truncation on an iteration the driver
    never logs is still seen by the end-of-pass check."""
    import jax.numpy as jnp

    from drt_tpu.intersect import get_intersect_fn
    from drt_tpu.mesh import build_mesh_state
    from drt_tpu.optimize.loop import make_train_step
    from drt_tpu.optimize.losses import LossWeights

    gt_v, gt_f = make_icosphere(subdivisions=2, radius=RADIUS)
    cap = synthesize_capture(gt_v, gt_f, name="sphere_smax", num_views=4,
                             resy=24, resx=24, ior=1.5, backend="brute",
                             num_view_used=4)
    ms = build_mesh_state(gt_v, gt_f)
    weights = LossWeights(ray_w=40.0, vh_w=2e-3, sm_w=0.08, ior=1.5)
    init_state, step, _ = make_train_step(
        get_intersect_fn("brute"), weights, 24, 24, silhouette_budget=8)
    state = init_state(ms)
    lr = jnp.asarray(0.0, jnp.float32)
    seen = []
    for it in range(3):
        silh = jnp.asarray([(it + k) % 4 for k in range(8)], jnp.int32)
        state, _loss, aux = step(state, lr, ms, cap.views,
                                 jnp.asarray(0, jnp.int32), silh)
        seen.append(int(aux["silh_edge_max"]))
    # the state's running max saw every iteration, and truncation happened
    assert int(state["silh_max"]) == max(seen) > 8


def test_schedules_match_reference_interp():
    """interp_linear / interp_reciprocal reproduce the reference's
    interp_L / interp_R (optim.py:147-153): endpoint values and the
    reciprocal's densification toward the end value."""
    from drt_tpu.optimize.schedules import interp_linear, interp_reciprocal

    # endpoints: pass 0 gets `start`, the LAST pass (num-1) gets `end`,
    # exactly like the reference's i_pass/(Pass-1) interpolation
    assert interp_linear(10.0, 1.0, 0, 5) == 10.0
    assert abs(interp_linear(10.0, 1.0, 4, 5) - 1.0) < 1e-12
    assert abs(interp_linear(10.0, 1.0, 2, 5) - 5.5) < 1e-12

    assert interp_reciprocal(10.0, 1.0, 0, 5) == 10.0
    assert abs(interp_reciprocal(10.0, 1.0, 4, 5) - 1.0) < 1e-9
    # reciprocal interpolation at the midpoint: 1/(0.5*(1/10+1/1)) = 20/11
    assert abs(interp_reciprocal(10.0, 1.0, 2, 5) - 20.0 / 11.0) < 1e-9
    # monotone decreasing across the pass index
    vals = [interp_reciprocal(10.0, 1.0, i, 20) for i in range(20)]
    assert all(a > b for a, b in zip(vals, vals[1:]))


def test_len_tracking_lr_schedule():
    """lr_schedule='len' ties the per-pass lr to the remesh edge length
    (start_lr at start_len, proportional thereafter) — the step-scale
    schedule for unit-normalized optimizers whose lr is an absolute
    displacement in mesh units. Exercises the loop's branch by parsing
    the per-pass log lines of a tiny 2-pass run."""
    import re

    from drt_tpu.optimize.schedules import interp_reciprocal

    gt_v, gt_f = make_icosphere(subdivisions=2, radius=RADIUS)
    cap = synthesize_capture(gt_v, gt_f, name="sphere_lrlen", num_views=4,
                             resy=24, resx=24, ior=1.5, backend="brute",
                             num_view_used=4)
    hp = HyperParams(name="sphere_lrlen", ior=1.5, num_passes=2, iters=1,
                     start_lr=0.1, start_len=12.0, end_len=8.0,
                     lr_schedule="len", optimizer="uadam",
                     backend="brute", silhouette_budget=256, num_view=4)
    lines = []
    optimize(hp, cap, gt_v, gt_f, remesh_fn=None, log_fn=lines.append)

    lrs = {}
    for ln in lines:
        m = re.match(r"pass (\d+): remesh_len ([\d.]+) lr ([\d.]+)", ln)
        if m:
            lrs[int(m.group(1))] = (float(m.group(2)), float(m.group(3)))
    assert set(lrs) == {0, 1}
    for i_pass, (remesh_len, lr) in lrs.items():
        expect_len = interp_reciprocal(12.0, 8.0, i_pass, 2)
        assert abs(remesh_len - expect_len) < 1e-4
        assert abs(lr - 0.1 * expect_len / 12.0) < 1e-4
    assert lrs[0][1] == 0.1 and lrs[1][1] < 0.1


def test_coarsen_policy_skip_preserves_init_topology():
    """coarsen_policy='skip' (config.py): no remesh at all while the
    scheduled target is coarser than the init's own mean edge length —
    the carved topology survives the early passes bit-exact."""
    gt_v, gt_f = make_icosphere(subdivisions=3, radius=RADIUS)
    cap = synthesize_capture(gt_v, gt_f, name="sphere", num_views=6,
                             resy=32, resx=32, ior=1.5, backend="brute",
                             num_view_used=6)
    v0, f0 = make_icosphere(subdivisions=3, radius=RADIUS)
    # init mean edge length ~ 10; schedule 30 -> 24 stays coarser than it
    hp = HyperParams(name="sphere", ior=1.5, num_passes=2, iters=5,
                     ray_w=40.0, vh_w=0.0, sm_w=0.08,
                     start_len=30.0, end_len=24.0,
                     coarsen_policy="skip",
                     backend="brute", silhouette_budget=256, num_view=6)
    lines = []
    out = optimize(hp, cap, v0, f0, remesh_fn="isotropic",
                   log_fn=lines.append)
    v_out, f_out = out.host_arrays()
    assert len(f_out) == len(f0)           # topology untouched
    assert any("remesh skipped" in s for s in lines)

    # "schedule" (parity) DOES coarsen the same config
    hp2 = hp.replace(coarsen_policy="schedule")
    out2 = optimize(hp2, cap, v0, f0, remesh_fn="isotropic",
                    log_fn=lambda s: None)
    _, f_out2 = out2.host_arrays()
    assert len(f_out2) < len(f0)


def test_coarsen_policy_auto_resolves_by_resolution():
    """'auto' picks 'skip' below 480 capture rows (the measured round-4
    crossover, reports/suite_r4_policy_skip + suite_r4_res_ablation) and
    'schedule' at or above. 32-row capture -> skip behavior."""
    gt_v, gt_f = make_icosphere(subdivisions=3, radius=RADIUS)
    cap = synthesize_capture(gt_v, gt_f, name="sphere", num_views=6,
                             resy=32, resx=32, ior=1.5, backend="brute",
                             num_view_used=6)
    v0, f0 = make_icosphere(subdivisions=3, radius=RADIUS)
    hp = HyperParams(name="sphere", ior=1.5, num_passes=2, iters=5,
                     ray_w=40.0, vh_w=0.0, sm_w=0.08,
                     start_len=30.0, end_len=24.0,
                     coarsen_policy="auto",
                     backend="brute", silhouette_budget=256, num_view=6)
    lines = []
    out = optimize(hp, cap, v0, f0, remesh_fn="isotropic",
                   log_fn=lines.append)
    _, f_out = out.host_arrays()
    assert any("auto -> skip" in s for s in lines)
    assert len(f_out) == len(f0)
