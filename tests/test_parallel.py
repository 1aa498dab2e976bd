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


def test_ray_arrays_actually_sharded(setup):
    cap, _, _ = setup
    mesh = make_ray_mesh(jax.devices()[:8])
    views_s = shard_views(mesh, cap.views)
    sh = views_s.ray_dir.sharding
    # the pixel axis is split across the 8 devices
    assert len(sh.device_set) == 8
    shard_shapes = {s.data.shape for s in views_s.ray_dir.addressable_shards}
    assert shard_shapes == {(4, 256 // 8, 3)}
