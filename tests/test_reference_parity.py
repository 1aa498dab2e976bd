"""True reference-parity: drt_tpu vs the reference's OWN code (VERDICT r3
missing #1). `tests/reference_harness.py` imports /root/reference's
DiffRender/optim on CPU torch with optix+trimesh stubbed (the stub oracle
delegates hit-finding to drt_tpu's brute backend, so both pipelines share
one non-differentiable hit oracle and the tests compare exactly what can
differ: the differentiable chains and loss assembly).

Covered, executing the reference's own lines:
- math kernels Refract / FrDielectric / JIT_Dintersect (DiffRender.py:36-121):
  values AND input gradients vs drt_tpu geometry kernels (compat mode, f64)
- ray loss through Scene.render_transparent / trace2 / refract_ray
  (DiffRender.py:420-432,503-546; optim.py:91-108)
- silhouette (vh) loss through silhouette_edge / primary_visibility /
  primary_edge_sample (DiffRender.py:189-267,445-479; optim.py:67-80)
- smoothness loss through dihedral_angle (DiffRender.py:440-443;
  optim.py:82-89)
- all_loss weighted total with the 217.5/resy normalizations
  (optim.py:110-130) and the full vertex gradient via loss.backward()
  vs jax.grad
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from drt_tpu.intersect import get_intersect_fn
from drt_tpu.mesh import build_mesh_state
from drt_tpu.mesh.ply import save_ply
from drt_tpu.render.camera import CameraM, generate_rays
from drt_tpu.render.trace import render_transparent
from drt_tpu.optimize.losses import LossWeights, total_loss
from drt_tpu.data.views import stack_views
from tests.meshes import make_icosphere
from tests.reference_harness import FakeData, load_reference

pytestmark = pytest.mark.filterwarnings("ignore")

RESY, RESX = 60, 80
N_VIEWS = 8
SILH_BUDGET = 512


# ---------------------------------------------------------------------------
# math kernels
# ---------------------------------------------------------------------------

def test_refract_kernel_parity_values_and_grads():
    ref = load_reference()
    torch = ref.torch
    rng = np.random.default_rng(0)
    n_np = rng.normal(size=(256, 3))
    n_np /= np.linalg.norm(n_np, axis=1, keepdims=True)
    # wo on the same side as n, away from grazing (the reference has no
    # radicand floor; drt floors at 1e-12 which only differs AT grazing)
    tang = rng.normal(size=(256, 3))
    tang -= np.sum(tang * n_np, axis=1, keepdims=True) * n_np
    tang /= np.linalg.norm(tang, axis=1, keepdims=True)
    ang = rng.uniform(0.05, 1.35, size=(256, 1))   # 3°..77° incidence
    wo_np = np.cos(ang) * n_np + np.sin(ang) * tang
    eta_np = rng.uniform(0.6, 1.5, size=256)

    wo_t = torch.tensor(wo_np, requires_grad=True)
    n_t = torch.tensor(n_np, requires_grad=True)
    tir_t, wt_t = ref.DiffRender.Refract(wo_t, n_t, torch.tensor(eta_np))
    cot = torch.tensor(rng.normal(size=(256, 3)))
    wt_t.backward(cot)

    from drt_tpu.geometry.vec import refract
    with jax.enable_x64():
        def f(wo, n):
            tir, wt = refract(wo, n, jnp.asarray(eta_np),
                              compat_cos_from_incident=True)
            return jnp.sum(wt * jnp.asarray(cot.numpy())), (tir, wt)
        (_, (tir_j, wt_j)), (g_wo, g_n) = jax.value_and_grad(
            f, argnums=(0, 1), has_aux=True)(
            jnp.asarray(wo_np), jnp.asarray(n_np))

    np.testing.assert_array_equal(np.asarray(tir_j), tir_t.numpy())
    np.testing.assert_allclose(np.asarray(wt_j), wt_t.detach().numpy(),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(g_wo), wo_t.grad.numpy(),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(g_n), n_t.grad.numpy(),
                               rtol=1e-9, atol=1e-12)


def test_fresnel_kernel_parity():
    ref = load_reference()
    torch = ref.torch
    rng = np.random.default_rng(1)
    cos_i = rng.uniform(0.05, 0.999, size=512)
    eta_i = np.full(512, 1.00029)
    eta_t = np.full(512, 1.4723)
    # include exiting-ray lanes (swapped etas, some TIR)
    eta_i[256:], eta_t[256:] = eta_t[256:], eta_i[256:].copy()

    c_t = torch.tensor(cos_i, requires_grad=True)
    tir_t, R_t = ref.DiffRender.FrDielectric(
        c_t, torch.tensor(eta_i), torch.tensor(eta_t))
    R_t.sum().backward()

    from drt_tpu.geometry.vec import fresnel_dielectric
    with jax.enable_x64():
        def f(c):
            tir, R = fresnel_dielectric(c, jnp.asarray(eta_i),
                                        jnp.asarray(eta_t))
            return jnp.sum(jnp.where(tir, 0.0, R)), (tir, R)
        (_, (tir_j, R_j)), g_c = jax.value_and_grad(f, has_aux=True)(
            jnp.asarray(cos_i))

    np.testing.assert_array_equal(np.asarray(tir_j), tir_t.numpy())
    keep = ~tir_t.numpy()
    np.testing.assert_allclose(np.asarray(R_j)[keep],
                               R_t.detach().numpy()[keep], rtol=1e-12)
    # the reference's TIR lanes produce NaN grads (sqrt of negative radicand
    # clamped to 0); compare non-TIR lanes
    np.testing.assert_allclose(np.asarray(g_c)[keep],
                               c_t.grad.numpy()[keep], rtol=1e-9,
                               atol=1e-12)


def test_moller_trumbore_parity_values_and_grads():
    ref = load_reference()
    torch = ref.torch
    rng = np.random.default_rng(2)
    n = 128
    tri_np = rng.normal(scale=3.0, size=(n, 3, 3)) + \
        np.array([0.0, 0.0, 10.0])
    # rays from origin through each triangle's centroid (guaranteed
    # non-degenerate intersections)
    o_np = rng.normal(scale=0.3, size=(n, 3))
    d_np = tri_np.mean(axis=1) - o_np + rng.normal(scale=0.2, size=(n, 3))
    d_np /= np.linalg.norm(d_np, axis=1, keepdims=True)

    o_t = torch.tensor(o_np, requires_grad=True)
    tri_t = torch.tensor(tri_np, requires_grad=True)
    u_t, v_t, t_t, n_t = ref.DiffRender.JIT_Dintersect(
        o_t, torch.tensor(d_np), tri_t, torch.zeros(n, 3, 3))
    cu = rng.normal(size=n)
    cn = rng.normal(size=(n, 3))
    (u_t * torch.tensor(cu)).sum().add(
        (n_t * torch.tensor(cn)).sum()).add(t_t.sum()).backward()

    from drt_tpu.geometry.mt import moller_trumbore
    with jax.enable_x64():
        def f(o, tri):
            u, v, t, nn = moller_trumbore(o, jnp.asarray(d_np), tri)
            return (jnp.sum(u * cu) + jnp.sum(nn * cn) + jnp.sum(t),
                    (u, v, t, nn))
        (_, (u_j, v_j, t_j, n_j)), (g_o, g_tri) = jax.value_and_grad(
            f, argnums=(0, 1), has_aux=True)(
            jnp.asarray(o_np), jnp.asarray(tri_np))

    np.testing.assert_allclose(np.asarray(u_j), u_t.detach().numpy(),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(v_j), v_t.detach().numpy(),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(t_j), t_t.detach().numpy(),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(n_j), n_t.detach().numpy(),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(g_o), o_t.grad.numpy(),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(g_tri), tri_t.grad.numpy(),
                               rtol=1e-8, atol=1e-10)


# ---------------------------------------------------------------------------
# end-to-end scenario: 8 synthetic views of a perturbed icosphere
# ---------------------------------------------------------------------------

def _look_at(cam_pos, center, up=(0.0, 0.0, 1.0)):
    """4x4 world->camera with +z looking from cam_pos toward center (the
    reference's convention: pixels back-project through K^-1 to z=1, then
    R^-1 to world — captured_data.py:23-40)."""
    fwd = np.asarray(center, np.float64) - np.asarray(cam_pos, np.float64)
    fwd /= np.linalg.norm(fwd)
    right = np.cross(fwd, np.asarray(up, np.float64))
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    Rw = np.stack([right, down, fwd])          # world->cam rotation rows
    R = np.eye(4)
    R[:3, :3] = Rw
    R[:3, 3] = -Rw @ np.asarray(cam_pos, np.float64)
    return R


@pytest.fixture(scope="module")
def scenario(tmp_path_factory):
    """Build the shared scenario: true sphere -> synthetic capture (targets,
    masks) -> perturbed evaluation mesh -> both pipelines' inputs."""
    ref = load_reference()
    torch = ref.torch
    rng = np.random.default_rng(42)

    v_true, f = make_icosphere(subdivisions=3, radius=100.0)
    v_true = v_true + np.array([37.0, -12.0, 55.0])
    center = v_true.mean(axis=0)

    K = np.array([[90.0, 0.0, RESX / 2.0],
                  [0.0, 90.0, RESY / 2.0],
                  [0.0, 0.0, 1.0]])

    views_np = []
    with jax.enable_x64():
        brute = get_intersect_fn("brute")
        ms_true = build_mesh_state(v_true, f, dtype=jnp.float64)
        for i in range(N_VIEWS):
            ang = 2.0 * np.pi * i / N_VIEWS
            cam_pos = center + 320.0 * np.array(
                [np.cos(ang), np.sin(ang), 0.25 * np.sin(2.5 * ang + 0.3)])
            R = _look_at(cam_pos, center)
            cam = CameraM(jnp.asarray(R), jnp.asarray(K),
                          jnp.asarray(np.linalg.inv(R)),
                          jnp.asarray(np.linalg.inv(K)))
            origin, ray_dir = generate_rays(RESY, RESX, cam)

            # soft mask through the reference's own process_mask
            # (captured_data.py:12-20)
            hits = brute(origin, ray_dir, ms_true.vertices, ms_true.faces,
                         ms_true.face_valid)
            occ = np.asarray(hits.hit).reshape(RESY, RESX).astype(np.uint8)
            assert 0 < occ.sum() < occ.size
            mask = ref.captured_data.process_mask(occ.copy())

            # environment-matting targets from the TRUE surface (view 0 is
            # the only ray-loss view, reference optim.py:95)
            res = render_transparent(origin, ray_dir, ms_true, brute,
                                     1.4723, 1.00029, compat=True)
            valid = np.asarray(res.valid)
            target = np.where(valid[:, None],
                              np.asarray(res.origin)
                              + 150.0 * np.asarray(res.direction),
                              center[None, :])

            views_np.append(dict(
                screen_pixel=target, valid=valid,
                mask=np.asarray(mask, np.float64),
                origin=np.asarray(origin), ray_dir=np.asarray(ray_dir),
                R=R, K=K))

    # evaluation mesh: perturbed true surface (non-trivial loss + grads).
    # Rounded to f32 so the PLY round-trip the reference Scene loads through
    # is lossless and both pipelines evaluate bit-identical vertices.
    v_eval = (v_true + rng.normal(scale=0.6, size=v_true.shape)) \
        .astype(np.float32).astype(np.float64)
    ply = tmp_path_factory.mktemp("parity") / "eval.ply"
    save_ply(str(ply), v_eval, f)

    # ----- reference side ---------------------------------------------------
    ref.DiffRender.resy = RESY
    ref.DiffRender.resx = RESX
    ref.DiffRender.intIOR = 1.4723
    scene = ref.DiffRender.Scene(str(ply))

    t_views = []
    for w in views_np:
        Rt = torch.tensor(w["R"])
        Kt = torch.tensor(w["K"])
        t_views.append(dict(
            screen_pixel=torch.tensor(w["screen_pixel"]),
            valid=torch.tensor(w["valid"]),
            mask=torch.tensor(w["mask"].reshape(-1)),
            origin=torch.tensor(w["origin"]),
            ray_dir=torch.tensor(w["ray_dir"]),
            camera_M=(Rt, Kt, torch.linalg.inv(Rt), torch.linalg.inv(Kt)),
        ))
    data = FakeData(t_views, RESY, RESX)

    # ----- drt_tpu side -----------------------------------------------------
    with jax.enable_x64():
        views = stack_views(
            [dict(screen_pixel=w["screen_pixel"], valid=w["valid"],
                  mask=w["mask"], origin=w["origin"],
                  ray_dir=w["ray_dir"], R=w["R"], K=w["K"])
             for w in views_np], dtype=jnp.float64)
        mesh = build_mesh_state(v_eval, f, dtype=jnp.float64)

    hp = ref.config.HyperParams
    weights = LossWeights(ray_w=hp["ray_w"], vh_w=hp["vh_w"],
                          sm_w=hp["sm_w"], ior=1.4723, compat=True)

    return SimpleNamespaceDict(
        ref=ref, scene=scene, data=data, mesh=mesh, views=views,
        weights=weights, v_eval=v_eval, f=f, n_real_verts=len(v_eval))


class SimpleNamespaceDict(dict):
    __getattr__ = dict.__getitem__


def _ref_calculator(sc):
    """Fresh Loss_calculator (fresh deterministic view generators)."""
    ref = sc.ref
    hp = dict(ref.config.HyperParams)
    hp["IOR"] = 1.4723
    return sc.ref.optim.Loss_calculator(sc.scene, sc.data, hp), hp


def _drt_losses(sc):
    with jax.enable_x64():
        brute = get_intersect_fn("brute")
        total, aux = total_loss(
            sc.mesh, sc.views, 0, jnp.arange(N_VIEWS), brute, sc.weights,
            RESY, RESX, SILH_BUDGET)
    assert int(aux["silh_edge_max"]) <= SILH_BUDGET
    return float(total), {k: float(v) for k, v in aux.items()
                          if k in ("ray", "vh", "sm")}


def test_ray_loss_parity(scenario):
    calc, _ = _ref_calculator(scenario)
    ref_ray = float(calc.ray_loss())
    _, aux = _drt_losses(scenario)
    np.testing.assert_allclose(aux["ray"], ref_ray, rtol=1e-9)


def test_vh_loss_parity(scenario):
    calc, _ = _ref_calculator(scenario)
    ref_vh = float(calc.vh_loss())
    _, aux = _drt_losses(scenario)
    np.testing.assert_allclose(aux["vh"], ref_vh, rtol=1e-9)


def test_sm_loss_parity(scenario):
    calc, _ = _ref_calculator(scenario)
    ref_sm = float(calc.sm_loss())
    _, aux = _drt_losses(scenario)
    np.testing.assert_allclose(aux["sm"], ref_sm, rtol=1e-9)


def test_process_mask_parity():
    """L4 parity: drt's scipy-based soft mask vs the reference's own
    cv2-based process_mask (captured_data.py:12-20), same binary input."""
    ref = load_reference()
    from drt_tpu.data.masks import process_mask as drt_process_mask
    rng = np.random.default_rng(3)
    m = np.zeros((48, 64), np.uint8)
    yy, xx = np.mgrid[:48, :64]
    for _ in range(4):
        cy, cx, r = rng.uniform(8, 40), rng.uniform(8, 56), rng.uniform(4, 14)
        m |= ((yy - cy) ** 2 + (xx - cx) ** 2 < r * r).astype(np.uint8)
    ref_mask = ref.captured_data.process_mask(m.copy())
    got = drt_process_mask(m)
    np.testing.assert_allclose(got, ref_mask, atol=1e-5)


def test_generate_ray_parity():
    """L4 parity: drt's generate_rays vs the reference's own generate_ray
    (captured_data.py:23-40) for the same K^-1/R^-1."""
    ref = load_reference()
    center = np.array([10.0, -4.0, 30.0])
    R = _look_at(center + np.array([300.0, 40.0, -20.0]), center)
    K = np.array([[85.0, 0.0, 32.0], [0.0, 85.0, 24.0], [0.0, 0.0, 1.0]])
    ro_t, rd_t = ref.captured_data.generate_ray(
        48, 64, np.linalg.inv(K), np.linalg.inv(R))
    with jax.enable_x64():
        cam = CameraM(jnp.asarray(R), jnp.asarray(K),
                      jnp.asarray(np.linalg.inv(R)),
                      jnp.asarray(np.linalg.inv(K)))
        o_j, d_j = generate_rays(48, 64, cam)
    np.testing.assert_allclose(np.asarray(o_j), ro_t.cpu().numpy(),
                               rtol=0, atol=1e-9)
    np.testing.assert_allclose(np.asarray(d_j), rd_t.cpu().numpy(),
                               rtol=0, atol=1e-12)


def test_full_iteration_sgd_parity(scenario):
    """L5 parity: two complete optimization iterations — all_loss, backward
    through the reference's own code, the limit hook (optim.py:155-162
    semantics), and torch.optim.SGD(momentum=0.95, nesterov=True) — exactly
    what optim.py:164-215 runs per iteration — vs drt's make_train_step in
    the parity configuration (sgd + none + clamp)."""
    sc = scenario
    ref = sc.ref
    torch = ref.torch
    from drt_tpu.optimize.loop import make_train_step

    lr = 0.05
    calc, hp = _ref_calculator(sc)
    init_v = sc.scene.vertices.detach().clone()
    p = torch.zeros_like(init_v, requires_grad=True)

    def limit_hook(grad):      # reference optim.py:155-162
        grad = grad.clone()
        grad[torch.isnan(grad)] = 0
        grad[grad > 1] = 1
        grad[grad < -1] = -1
        return grad

    p.register_hook(limit_hook)
    opt = torch.optim.SGD([p], lr=lr, momentum=hp["momentum"],
                          nesterov=True)
    for _ in range(2):
        opt.zero_grad()
        sc.scene.update_verticex(init_v + p)
        loss_t, _ = calc.all_loss()
        loss_t.backward()
        opt.step()
    v_ref = (init_v + p).detach().numpy()

    with jax.enable_x64():
        brute = get_intersect_fn("brute")
        init_state, step, final_vertices = make_train_step(
            brute, sc.weights, RESY, RESX, SILH_BUDGET,
            momentum=hp["momentum"], optimizer="sgd", precond="none")
        st = init_state(sc.mesh)
        losses = []
        for _ in range(2):
            st, loss_j, _aux = step(st, lr, sc.mesh, sc.views, 0,
                                    jnp.arange(N_VIEWS))
            losses.append(float(loss_j))
        v_drt = np.asarray(final_vertices(st, sc.mesh))[: sc.n_real_verts]

    np.testing.assert_allclose(v_drt, v_ref, rtol=1e-7, atol=1e-8)
    assert losses[1] != losses[0]   # the steps actually moved the mesh

    # restore the scene's vertices for any test running after this one
    sc.scene.update_verticex(init_v)


def test_all_loss_and_vertex_grad_parity(scenario):
    """The headline parity claim: total loss (optim.py:110-130 executing the
    reference's own weight/normalization lines) and the full vertex gradient
    via loss.backward() match drt_tpu's jax.grad in compat-f64 mode."""
    sc = scenario
    ref = sc.ref
    torch = ref.torch

    calc, hp = _ref_calculator(sc)
    init_vertices = sc.scene.vertices.detach().clone()
    parameter = torch.zeros_like(init_vertices, requires_grad=True)
    vertices = init_vertices + parameter
    sc.scene.update_verticex(vertices)
    loss_t, _ = calc.all_loss()
    loss_t.backward()
    g_ref = parameter.grad.numpy()

    with jax.enable_x64():
        brute = get_intersect_fn("brute")

        def loss_fn(verts):
            m = sc.mesh.with_vertices(verts)
            total, _aux = total_loss(
                m, sc.views, 0, jnp.arange(N_VIEWS), brute, sc.weights,
                RESY, RESX, SILH_BUDGET)
            return total

        total_j, g_j = jax.value_and_grad(loss_fn)(sc.mesh.vertices)

    V = sc.n_real_verts
    g_j = np.asarray(g_j)[:V]
    np.testing.assert_allclose(float(total_j), float(loss_t), rtol=1e-9)
    scale = np.abs(g_ref).max()
    assert scale > 0
    np.testing.assert_allclose(g_j, g_ref, rtol=1e-7, atol=1e-9 * scale)
