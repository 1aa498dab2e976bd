"""End-to-end compat-mode parity: the COMPOSED 2-bounce trace in compat mode
(reference Refract formula + absolute 1e-5 offset + float64) must match an
independently written float64 reference chain (VERDICT.md round-1 item 3,
closing the BASELINE.json "allclose to reference pipeline" bar as far as
this hardware allows).

The independent chain below is hand-built numpy following the reference's
documented semantics (DiffRender.py:503-546: entering test by the sign of
cos, eta/normal flip for exiting rays, Refract with cosThetaT computed from
sin²θI at :42, absolute 1e-5 nudge at :532, exit-occlusion query at :426) —
it shares no code with drt_tpu's trace.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from drt_tpu.intersect import get_intersect_fn
from drt_tpu.mesh import build_mesh_state
from drt_tpu.render.trace import render_transparent
from tests.meshes import make_icosphere

INT_IOR, EXT_IOR = 1.4723, 1.00029


# --- independent numpy float64 chain ---------------------------------------

def np_closest_hit(o, d, tri):
    """All-pairs Möller–Trumbore closest hit. Returns (hit, t, face, n)."""
    v0, v1, v2 = tri[:, 0], tri[:, 1], tri[:, 2]
    e1, e2 = v1 - v0, v2 - v0                     # [F,3]
    pvec = np.cross(d[:, None, :], e2[None])      # [N,F,3]
    det = np.einsum("fj,nfj->nf", e1, pvec)
    inv = 1.0 / np.where(np.abs(det) > 1e-12, det, 1e-12)
    tvec = o[:, None, :] - v0[None]
    u = np.einsum("nfj,nfj->nf", tvec, pvec) * inv
    qvec = np.cross(tvec, e1[None])
    v = np.einsum("nj,nfj->nf", d, qvec) * inv
    t = np.einsum("fj,nfj->nf", e2, qvec) * inv
    ok = (np.abs(det) > 1e-12) & (u >= 0) & (v >= 0) & (u + v <= 1) \
        & (t > 1e-6)
    t_masked = np.where(ok, t, np.inf)
    face = np.argmin(t_masked, axis=1)
    hit = np.isfinite(t_masked[np.arange(len(o)), face])
    tbest = t_masked[np.arange(len(o)), face]
    n = np.cross(e1[face], e2[face])
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    return hit, np.where(hit, tbest, 1.0), face, n


def np_refract_event(o, d, t, n):
    """One reference refraction event (entering/exiting flip + compat
    Refract + absolute 1e-5 nudge)."""
    wo = -d
    cos_i = np.clip(np.sum(wo * n, axis=1), -1.0, 1.0)
    entering = cos_i > 0
    eta_i = np.where(entering, EXT_IOR, INT_IOR)
    eta_t = np.where(entering, INT_IOR, EXT_IOR)
    n = np.where(entering[:, None], n, -n)
    cos_i = np.abs(cos_i)
    eta = (eta_i / eta_t)[:, None]
    sin2_i = np.clip(1.0 - cos_i * cos_i, 0.0, None)
    sin2_t = eta[:, 0] ** 2 * sin2_i
    tir = sin2_t >= 1.0
    cos_t = np.sqrt(1.0 - np.minimum(sin2_i, 1.0))   # the reference's quirk
    wt = eta * -wo + (eta * cos_i[:, None] - cos_t[:, None]) * n
    wt = wt / np.linalg.norm(wt, axis=1, keepdims=True)
    new_o = o + t[:, None] * d + 1e-5 * wt
    return ~tir, new_o, wt


def np_reference_trace(o, d, tri):
    """Full reference semantics: 2 bounces + exit occlusion. Returns
    (valid, exit_o, exit_d, faces_hit [N,2])."""
    faces_hit = np.full((len(o), 2), -1)
    hit1, t1, f1, n1 = np_closest_hit(o, d, tri)
    faces_hit[:, 0] = np.where(hit1, f1, -1)
    ref1, o1, d1 = np_refract_event(o, d, t1, n1)
    alive = hit1 & ref1

    hit2, t2, f2, n2 = np_closest_hit(o1, d1, tri)
    faces_hit[:, 1] = np.where(alive & hit2, f2, -1)
    ref2, o2, d2 = np_refract_event(o1, d1, t2, n2)
    alive = alive & hit2 & ref2

    hit3, _, _, _ = np_closest_hit(o2, d2, tri)
    valid = alive & ~hit3
    return valid, o2, d2, faces_hit


# --- the parity test --------------------------------------------------------

@pytest.mark.filterwarnings("ignore")
def test_compat_trace_matches_independent_reference_chain():
    v, f = make_icosphere(subdivisions=3, radius=100.0)
    # move off the origin to the bundled meshes' coordinate regime
    v = v + np.array([37.0, -12.0, 55.0])
    rng = np.random.default_rng(7)
    n_rays = 512
    cam = np.array([400.0, 150.0, 300.0])
    targets = v.mean(0) + rng.normal(scale=55.0, size=(n_rays, 3))
    d = targets - cam
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = np.broadcast_to(cam, d.shape).copy()

    tri = v[f]
    ref_valid, ref_o, ref_d, ref_faces = np_reference_trace(o, d, tri)
    assert ref_valid.sum() > 50   # the bundle must exercise real refraction

    with jax.enable_x64():
        ms = build_mesh_state(v, f, dtype=jnp.float64)
        res = render_transparent(
            jnp.asarray(o, jnp.float64), jnp.asarray(d, jnp.float64),
            ms, get_intersect_fn("brute"), INT_IOR, EXT_IOR,
            offset_eps=1e-5, compat=True)
        got_valid = np.asarray(res.valid)
        got_o = np.asarray(res.origin)
        got_d = np.asarray(res.direction)

    # Oracle choices can legitimately differ on grazing rays; compare the
    # composed differentiable chain on rays where both pipelines agree they
    # are valid — and require that to be essentially all of them.
    both = ref_valid & got_valid
    agree_frac = both.sum() / max(ref_valid.sum(), got_valid.sum())
    assert agree_frac > 0.98, (ref_valid.sum(), got_valid.sum())

    np.testing.assert_allclose(got_o[both], ref_o[both], rtol=0, atol=1e-6)
    np.testing.assert_allclose(got_d[both], ref_d[both], rtol=0, atol=1e-9)


@pytest.mark.filterwarnings("ignore")
def test_compat_differs_from_default_away_from_normal_incidence():
    """Sanity: compat mode is really a different (reference-quirk) formula —
    the default correct-Snell trace must disagree with it at oblique
    incidence, else the flag is dead."""
    v, f = make_icosphere(subdivisions=3, radius=100.0)
    rng = np.random.default_rng(3)
    cam = np.array([400.0, 0.0, 120.0])
    targets = rng.normal(scale=60.0, size=(128, 3))
    d = targets - cam
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = np.broadcast_to(cam, d.shape).copy()

    with jax.enable_x64():
        ms = build_mesh_state(v, f, dtype=jnp.float64)
        args = (jnp.asarray(o, jnp.float64), jnp.asarray(d, jnp.float64),
                ms, get_intersect_fn("brute"), INT_IOR, EXT_IOR)
        res_c = render_transparent(*args, offset_eps=1e-5, compat=True)
        res_s = render_transparent(*args, offset_eps=1e-5)
    both = np.asarray(res_c.valid) & np.asarray(res_s.valid)
    assert both.sum() > 30
    diff = np.linalg.norm(np.asarray(res_c.direction)[both]
                          - np.asarray(res_s.direction)[both], axis=1)
    assert diff.max() > 1e-3
