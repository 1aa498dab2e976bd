"""TRUE reference parity: execute the reference's OWN code (VERDICT r3
missing #1 / next-item 2).

`/root/reference/DiffRender.py` and `optim.py` are imported and run on CPU
torch (float64) with their two GPU/external dependencies replaced at the
seams the reference itself defines:

- the `optix` cpp_extension (loaded at DiffRender.py:5-6) is replaced by a
  fake `optix_mesh` whose `intersect(rays[n,6]) -> (T, triId)` calls THIS
  project's brute-force oracle (intersect/brute.py) — the same oracle the
  drt_tpu side uses, so the non-differentiable hit classification is shared
  and the differentiable math is compared in isolation. Miss ⇔ T<=0 exactly
  as optix_extend.cpp (DiffRender.py:391).
- `trimesh` (topology caches only: edges/edges_sorted/edges_face/
  group_rows/vertex_neighbors, DiffRender.py:304-370) is replaced by a
  minimal numpy implementation with trimesh's documented conventions
  (face-major directed edges).
- `torch.sparse.FloatTensor` (removed legacy ctor, DiffRender.py:334,370)
  is shimmed to `torch.sparse_coo_tensor` — its documented replacement.

Then the reference's `Refract`/`FrDielectric`/`JIT_Dintersect`
(DiffRender.py:36-121), `Scene.refract_ray`/`trace2`/`render_transparent`
(DiffRender.py:420-432,503-546), `silhouette_edge`/`primary_visibility`/
`primary_edge_sample` (DiffRender.py:191-267,445-479) and
`optim.Loss_calculator.all_loss` (optim.py:59-130, reference weights) run
against identical inputs on both sides, asserting per-term losses AND
vertex gradients allclose vs drt_tpu's compat-f64 mode.
"""

from __future__ import annotations

import itertools
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from tests.meshes import make_icosphere

REF_PATH = "/root/reference"
INT_IOR, EXT_IOR = 1.4723, 1.00029
RESY = RESX = 64


# --- minimal trimesh replacement (topology caches only) ---------------------

class _FakeTrimesh:
    """The slice of trimesh.Trimesh that Scene.update_mesh/init_edge/
    init_weightM read (DiffRender.py:304-370), built in numpy with trimesh's
    conventions: `edges` are the 3F directed face edges in face-major order,
    `edges_face` maps each to its face."""

    def __init__(self, vertices, faces):
        self.vertices = np.asarray(vertices, np.float64)
        self.faces = np.asarray(faces, np.int64)
        f = self.faces
        self.edges = f[:, [0, 1, 1, 2, 2, 0]].reshape(-1, 2)   # [3F,2]
        self.edges_sorted = np.sort(self.edges, axis=1)
        self.edges_face = np.repeat(np.arange(len(f)), 3)
        self.is_watertight = True

    @property
    def vertex_neighbors(self):
        nbr = [set() for _ in range(len(self.vertices))]
        for a, b in self.edges:
            nbr[a].add(int(b))
            nbr[b].add(int(a))
        return [sorted(s) for s in nbr]


def _group_rows(rows, require_count=2):
    """trimesh.grouping.group_rows: indices of identical rows, grouped;
    only groups of exactly `require_count` are returned ([G, count])."""
    rows = np.asarray(rows)
    order = np.lexsort(rows.T[::-1])
    srt = rows[order]
    new = np.any(srt[1:] != srt[:-1], axis=1)
    starts = np.concatenate([[0], np.nonzero(new)[0] + 1, [len(rows)]])
    groups = [order[a:b] for a, b in zip(starts[:-1], starts[1:])
              if b - a == require_count]
    return np.asarray(groups)


# --- fake optix module: this project's brute oracle behind the C++ API ------

class _FakeOptixMesh:
    """optix_extend.cpp's optix_mesh: update_mesh(F,V)/update_vert(V)/
    intersect(rays[n,6]) -> (T[n] f32, triId[n] i32), miss ⇔ T<=0."""

    def __init__(self, cuda_device=0):
        self.F = None
        self.V = None

    def update_mesh(self, F, V):
        self.F = jnp.asarray(F.detach().cpu().numpy())
        self.update_vert(V)

    def update_vert(self, V):
        self.V = jnp.asarray(V.detach().cpu().numpy(), jnp.float32)

    def intersect(self, rays):
        from drt_tpu.intersect.brute import intersect_brute
        r = rays.detach().cpu().numpy()
        hits = intersect_brute(jnp.asarray(r[:, :3]), jnp.asarray(r[:, 3:]),
                               self.V, self.F)
        t = np.asarray(hits.t)
        tid = np.asarray(hits.tri_id)
        T = np.where(np.isfinite(t), t, -1.0).astype(np.float32)
        return torch.from_numpy(T), torch.from_numpy(tid.astype(np.int64))


@pytest.fixture(scope="module")
def reference():
    """Import the reference's DiffRender + optim with optix/trimesh stubbed;
    configure for CPU float64 at this test's resolution."""
    fake_tm = types.ModuleType("trimesh")

    def _load(path, process=False):
        from drt_tpu.mesh import load_ply
        v, f = load_ply(path)
        return _FakeTrimesh(v, f)

    fake_tm.load = _load
    fake_tm.grouping = types.ModuleType("trimesh.grouping")
    fake_tm.grouping.group_rows = _group_rows

    import torch.utils.cpp_extension as cppext
    fake_optix = types.SimpleNamespace(optix_mesh=_FakeOptixMesh)
    orig_load = cppext.load
    cppext.load = lambda *a, **k: fake_optix
    sys.modules.setdefault("trimesh", fake_tm)
    if REF_PATH not in sys.path:
        sys.path.insert(0, REF_PATH)
    # torch 2.x removed the legacy sparse ctor the reference uses
    # (DiffRender.py:334,370); sparse_coo_tensor is its documented
    # replacement with identical semantics.
    if not hasattr(torch.sparse, "FloatTensor"):
        torch.sparse.FloatTensor = (
            lambda coo, w, size: torch.sparse_coo_tensor(coo, w, tuple(size)))
    try:
        import DiffRender as Render
        import optim as ref_optim
    finally:
        cppext.load = orig_load
    Render.device = "cpu"
    Render.Float = torch.float64
    Render.resy, Render.resx = RESY, RESX
    Render.intIOR, Render.extIOR = INT_IOR, EXT_IOR
    ref_optim.device = "cpu"
    return Render, ref_optim


# --- the shared scene + view -------------------------------------------------

@pytest.fixture(scope="module")
def scene_np(tmp_path_factory):
    """(v, f, ply_path, view arrays): one synthetic view of an offset
    icosphere at the bundled meshes' coordinate scale, built in float64."""
    # Unit-scale coordinates: at the bundled meshes' ~100-unit scale the
    # reference's absolute 1e-5 exit nudge (DiffRender.py:532) sits BELOW
    # f32 ULP, so the f32 oracle's self-re-hit classification is chaotic at
    # rounding level and no two f64 implementations can agree lane-for-lane
    # (render/trace.py refract_ray docstring). At radius 2.5 the nudge is
    # ~100 ULP and every lane is well-posed; the math chain is unchanged.
    v, f = make_icosphere(subdivisions=2, radius=2.5)
    v = v + np.array([0.9, -0.3, 1.4])
    # PLY stores f32; round the master copy so the reference side (which
    # loads the PLY) and the drt side (which gets the array) see identical
    # coordinates.
    v = v.astype(np.float32).astype(np.float64)
    ply = tmp_path_factory.mktemp("parity") / "sphere.ply"
    from drt_tpu.mesh import save_ply
    save_ply(str(ply), v, f)

    center = v.mean(axis=0)
    cam_pos = center + np.array([10.0, 1.5, 3.0])
    from drt_tpu.data.synthetic import intrinsics, look_at_extrinsic
    R = np.asarray(look_at_extrinsic(cam_pos, center), np.float64)
    K = np.asarray(intrinsics(RESY, RESX, 45.0), np.float64)
    R_inv = np.linalg.inv(R)
    K_inv = np.linalg.inv(K)

    with jax.enable_x64():
        from drt_tpu.render.camera import CameraM, generate_rays
        cam = CameraM(jnp.asarray(R), jnp.asarray(K), jnp.asarray(R_inv),
                      jnp.asarray(K_inv))
        origin_j, dir_j = generate_rays(RESY, RESX, cam)
    origin = np.asarray(origin_j, np.float64)
    ray_dir = np.asarray(dir_j, np.float64)

    rng = np.random.default_rng(3)
    behind = center - 3.0 * (cam_pos - center)
    screen = behind[None] + rng.normal(scale=1.0, size=(len(ray_dir), 3))
    # Matting validity: exclude the silhouette-grazing band, where hit/TIR
    # classification is genuinely chaotic (the f32 oracle flips on tiny
    # input differences; real environment matting marks exactly these
    # pixels invalid — captured_data.py's valid mask). Both sides mask
    # them identically, so parity is asserted on the well-posed rays.
    d_perp = np.linalg.norm(
        np.cross(center - origin, ray_dir), axis=1)   # ray-line distance
    valid = np.abs(d_perp - 2.5) > 0.3
    yy, xx = np.mgrid[0:RESY, 0:RESX].astype(np.float64)
    mask = 1.0 / (1.0 + np.exp(
        0.25 * (np.hypot(yy - RESY / 2, xx - RESX / 2) - RESY / 3)))
    return dict(v=v, f=f, ply=str(ply), R=R, K=K, R_inv=R_inv, K_inv=K_inv,
                origin=origin, ray_dir=ray_dir, screen=screen, valid=valid,
                mask=mask)


class _FakeData:
    """The Data surface Loss_calculator reads (optim.py:59-108):
    get_view + the two view-index generators + resy/resx."""

    def __init__(self, s):
        self.resy, self.resx = RESY, RESX
        t = lambda x: torch.tensor(x, dtype=torch.float64)
        cam = (t(s["R"]), t(s["K"]), t(s["R_inv"]), t(s["K_inv"]))
        self._view = (t(s["screen"]), torch.tensor(s["valid"]),
                      t(s["mask"].reshape(-1)), t(s["origin"]),
                      t(s["ray_dir"]), cam)

    def get_view(self, idx):
        return self._view

    def ray_view_generator(self):
        return itertools.repeat(0)

    def silh_view_generator(self):
        return itertools.repeat(0)


def _reference_loss_and_grad(reference, s, weights):
    """Run the reference's own Loss_calculator.all_loss (optim.py:110-130)
    at vertices = init + 0 and return (per-term values, total, grad[V,3])."""
    Render, ref_optim = reference
    scene = Render.Scene(s["ply"])
    data = _FakeData(s)
    hp = {"ray_w": weights[0], "vh_w": weights[1], "sm_w": weights[2]}
    lc = ref_optim.Loss_calculator(scene, data, hp)

    init_v = scene.vertices.detach().clone()
    param = torch.zeros_like(init_v, requires_grad=True)
    scene.update_verticex(init_v + param)
    loss, _log = lc.all_loss()
    loss.backward()

    # re-evaluate the raw per-term values for diagnostics
    scene.update_verticex(init_v + torch.zeros_like(init_v))
    terms = (float(lc.ray_loss()), float(lc.vh_loss()), float(lc.sm_loss()))
    return terms, float(loss), param.grad.detach().numpy()


def _drt_loss_and_grad(s, weights, budget=512):
    """Same quantities through drt_tpu in compat-f64 mode with the brute
    oracle (LossWeights.compat reproduces DiffRender.py:36-49's Refract and
    the absolute 1e-5 nudge of :532)."""
    from drt_tpu.data.views import ViewBatch
    from drt_tpu.intersect import get_intersect_fn
    from drt_tpu.mesh import build_mesh_state
    from drt_tpu.optimize.losses import LossWeights, total_loss

    with jax.enable_x64():
        ms = build_mesh_state(s["v"], s["f"], dtype=jnp.float64)
        a = lambda x: jnp.asarray(x)[None]
        views = ViewBatch(
            screen_pixel=a(s["screen"]), valid=a(s["valid"]),
            mask=a(s["mask"]), origin=a(s["origin"]),
            ray_dir=a(s["ray_dir"]), R=a(s["R"]), K=a(s["K"]),
            R_inv=a(s["R_inv"]), K_inv=a(s["K_inv"]))
        w = LossWeights(ray_w=weights[0], vh_w=weights[1], sm_w=weights[2],
                        ior=INT_IOR, ext_ior=EXT_IOR, compat=True)
        fn = get_intersect_fn("brute")
        nv = len(s["v"])

        def loss_fn(p):
            m = ms.with_vertices(ms.vertices.at[:nv].add(p))
            return total_loss(m, views, 0, jnp.zeros(8, jnp.int32), fn, w,
                              RESY, RESX, budget)

        p0 = jnp.zeros((nv, 3), jnp.float64)
        (loss, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(p0)
        terms = (float(aux["ray"]), float(aux["vh"]), float(aux["sm"]))
        return terms, float(loss), np.asarray(g)


@pytest.mark.filterwarnings("ignore")
class TestReferenceParity:
    def _compare(self, reference, scene_np, weights, loss_rtol=1e-9,
                 grad_rtol=1e-6):
        """loss_rtol/grad_rtol: the ray term is conditioning-limited — f64
        rounding differences between torch and jax (operation order in
        cross/dot) amplify through near-TIR refraction by ~1e8 — so its
        tolerances are looser than the vh/sm terms', which agree to f64
        rounding."""
        ref_terms, ref_loss, ref_g = _reference_loss_and_grad(
            reference, scene_np, weights)
        got_terms, got_loss, got_g = _drt_loss_and_grad(scene_np, weights)
        for name, r, g, on in zip(("ray", "vh", "sm"), ref_terms, got_terms,
                                  weights):
            if on:
                np.testing.assert_allclose(
                    g, r, rtol=loss_rtol, atol=1e-12,
                    err_msg=f"{name} loss value diverges from the "
                            f"reference's own computation")
        np.testing.assert_allclose(got_loss, ref_loss, rtol=loss_rtol,
                                   atol=1e-12)
        scale = np.abs(ref_g).max()
        assert scale > 0
        np.testing.assert_allclose(
            got_g, ref_g, rtol=grad_rtol, atol=grad_rtol * scale,
            err_msg="vertex gradient diverges from the reference's autograd")
        return np.abs(got_g - ref_g).max() / scale

    def test_ray_term(self, reference, scene_np):
        """render_transparent -> trace2 -> Dintersect/refract_ray
        (DiffRender.py:420-432,492-546) + ray_loss (optim.py:91-108)."""
        self._compare(reference, scene_np, (40.0, 0.0, 0.0),
                      loss_rtol=1e-6, grad_rtol=1e-4)

    def test_silhouette_term(self, reference, scene_np):
        """silhouette_edge/primary_visibility/primary_edge_sample
        (DiffRender.py:191-267,445-479) + vh_loss (optim.py:67-80)."""
        self._compare(reference, scene_np, (0.0, 2e-3, 0.0))

    def test_smoothness_term(self, reference, scene_np):
        """dihedral_angle/edge_face_norm (DiffRender.py:150-163,440-443) +
        sm_loss (optim.py:82-89)."""
        self._compare(reference, scene_np, (0.0, 0.0, 0.08))

    def test_all_terms_reference_weights(self, reference, scene_np):
        """The full all_loss weighted sum with the reference's shipped
        weights (config.py:27-30, optim.py:127-129)."""
        self._compare(reference, scene_np, (40.0, 2e-3, 0.08),
                      loss_rtol=1e-6, grad_rtol=1e-4)

    def test_refract_kernel_direct(self, reference, scene_np):
        """Direct kernel-level check: the reference's Refract/FrDielectric
        (DiffRender.py:36-61) vs drt_tpu's compat refract/fresnel on shared
        random directions — no scene, pure math."""
        Render, _ = reference
        rng = np.random.default_rng(11)
        n = np.array([0.0, 0.0, 1.0])[None].repeat(256, 0)
        wo = rng.normal(size=(256, 3))
        wo /= np.linalg.norm(wo, axis=1, keepdims=True)
        wo[:, 2] = np.abs(wo[:, 2])
        eta = np.full(256, EXT_IOR / INT_IOR)

        tir_t, wt_t = Render.Refract(torch.tensor(wo), torch.tensor(n),
                                     torch.tensor(eta))
        cos_i = np.clip((wo * n).sum(1), -1, 1)
        _, R_t = Render.FrDielectric(torch.tensor(cos_i),
                                     torch.tensor(np.full(256, EXT_IOR)),
                                     torch.tensor(np.full(256, INT_IOR)))

        from drt_tpu.geometry.vec import fresnel_dielectric, refract
        with jax.enable_x64():
            tir_j, wt_j = refract(jnp.asarray(wo), jnp.asarray(n),
                                  jnp.asarray(eta),
                                  compat_cos_from_incident=True)
            _, R_j = fresnel_dielectric(jnp.asarray(np.abs(cos_i)),
                                        jnp.full(256, EXT_IOR),
                                        jnp.full(256, INT_IOR))
        np.testing.assert_array_equal(np.asarray(tir_j),
                                      tir_t.numpy().reshape(-1))
        np.testing.assert_allclose(np.asarray(wt_j), wt_t.numpy(),
                                   rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(np.asarray(R_j), R_t.numpy(),
                                   rtol=1e-12, atol=1e-12)
