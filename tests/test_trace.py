"""2-bounce refraction trace tests against analytic optics."""

import jax
import jax.numpy as jnp
import numpy as np

from drt_tpu.intersect import get_intersect_fn
from drt_tpu.mesh import build_mesh_state
from drt_tpu.render import render_transparent, render_mask, trace2
from tests.meshes import make_cube, make_icosphere

IOR = 1.5
EXT = 1.0


def cube_scene():
    v, f = make_cube()  # unit cube at origin
    return build_mesh_state(v, f)


class TestSlab:
    """A glass slab (cube) — the classic parallel-displacement case."""

    def test_normal_incidence_passthrough(self):
        ms = cube_scene()
        fn = get_intersect_fn("brute")
        o = jnp.array([[0.1, 0.2, -5.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        res = render_transparent(o, d, ms, fn, IOR, EXT)
        assert bool(res.valid[0])
        # direction unchanged
        np.testing.assert_allclose(np.asarray(res.direction[0]),
                                   [0, 0, 1], atol=1e-6)
        # exit point on the far face, same xy
        np.testing.assert_allclose(np.asarray(res.origin[0])[:2],
                                   [0.1, 0.2], atol=1e-5)
        np.testing.assert_allclose(float(res.origin[0, 2]), 0.5, atol=1e-4)

    def test_oblique_parallel_offset(self):
        """Exit ray parallel to entry ray; lateral offset matches the slab
        formula d = h*sin(i)*(1 - cos(i)/(n*cos(r)))."""
        ms = cube_scene()
        fn = get_intersect_fn("brute")
        th = np.deg2rad(30.0)
        d_in = np.array([np.sin(th), 0.0, np.cos(th)])
        # aim at the center of the front face
        o = jnp.array([-5.0 * d_in + np.array([0, 0, 0.0])])[None][0].reshape(1, 3)
        d = jnp.array([d_in])
        res = render_transparent(o, d, ms, fn, IOR, EXT)
        assert bool(res.valid[0])
        out_d = np.asarray(res.direction[0])
        np.testing.assert_allclose(out_d, d_in, atol=1e-5)

        # analytic lateral displacement through thickness h=1
        sin_r = np.sin(th) / IOR
        r = np.arcsin(sin_r)
        h = 1.0
        lateral = h * np.sin(th - r) / np.cos(r)
        # entry point at z=-0.5 with x chosen so ray passes (0,0,0):
        # entry x = -0.5*tan(th)... compute expected exit x directly:
        x_entry = -0.5 * np.tan(th)
        x_exit = x_entry + h * np.tan(r)
        np.testing.assert_allclose(float(res.origin[0, 0]), x_exit, atol=1e-4)
        np.testing.assert_allclose(float(res.origin[0, 2]), 0.5, atol=1e-4)
        # displacement magnitude sanity
        assert 0 < lateral < np.sin(th)

    def test_miss_is_invalid(self):
        ms = cube_scene()
        fn = get_intersect_fn("brute")
        o = jnp.array([[5.0, 5.0, -5.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        res = render_transparent(o, d, ms, fn, IOR, EXT)
        assert not bool(res.valid[0])
        np.testing.assert_allclose(np.asarray(res.origin[0]), 0.0)
        np.testing.assert_allclose(np.asarray(res.direction[0]), 0.0)

    def test_render_mask(self):
        ms = cube_scene()
        fn = get_intersect_fn("brute")
        o = jnp.array([[0.0, 0.0, -5.0], [5.0, 5.0, -5.0]])
        d = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
        img = render_mask(o, d, ms, fn)
        np.testing.assert_allclose(np.asarray(img), [1.0, 0.0])


class TestSphereLens:
    def test_all_center_rays_valid(self):
        """Rays near the optical axis of a sphere refract twice and escape."""
        v, f = make_icosphere(subdivisions=3)
        ms = build_mesh_state(v, f)
        fn = get_intersect_fn("brute")
        xs = np.linspace(-0.3, 0.3, 9)
        o = jnp.array([[x, 0.0, -5.0] for x in xs])
        d = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), o.shape)
        res = render_transparent(o, d, ms, fn, IOR, EXT)
        assert bool(res.valid.all())
        # central ray goes straight through
        c = len(xs) // 2
        np.testing.assert_allclose(np.asarray(res.direction[c]), [0, 0, 1],
                                   atol=1e-3)
        # off-axis rays converge toward the axis (positive lens)
        out = np.asarray(res.direction)
        assert out[0, 0] > 1e-3      # left ray bends right
        assert out[-1, 0] < -1e-3    # right ray bends left

    def test_grazing_tir_lane_masked(self):
        """Rays that graze the sphere can TIR inside; they must come out
        invalid, never NaN."""
        v, f = make_icosphere(subdivisions=3)
        ms = build_mesh_state(v, f)
        fn = get_intersect_fn("brute")
        xs = np.linspace(0.9, 0.999, 16)
        o = jnp.array([[x, 0.0, -5.0] for x in xs])
        d = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), o.shape)
        res = render_transparent(o, d, ms, fn, IOR, EXT)
        assert bool(jnp.isfinite(res.origin).all())
        assert bool(jnp.isfinite(res.direction).all())


class TestGradients:
    def test_grad_flows_to_vertices_and_is_finite(self):
        """d(exit dir)/d(vertices): nonzero, finite, and zero on lanes that
        miss — the whole point of the differentiable trace."""
        v, f = make_icosphere(subdivisions=2)
        ms = build_mesh_state(v, f)
        fn = get_intersect_fn("brute")
        o = jnp.array([[0.2, 0.1, -5.0], [5.0, 5.0, -5.0]])  # hit, miss
        d = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), o.shape)

        def loss(verts):
            m = ms.with_vertices(verts)
            res = render_transparent(o, d, m, fn, IOR, EXT)
            return jnp.sum(res.direction[:, 0])

        g = jax.grad(loss)(ms.vertices)
        assert bool(jnp.isfinite(g).all())
        assert float(jnp.abs(g).sum()) > 0

    def test_grad_matches_finite_difference(self):
        """Directional derivative of exit direction w.r.t. a vertex bump
        agrees with central finite differences (f64)."""
        jax.config.update("jax_enable_x64", True)
        try:
            v, f = make_icosphere(subdivisions=2)
            ms = build_mesh_state(v, f, dtype=jnp.float64)
            fn = get_intersect_fn("brute")
            o = jnp.array([[0.2, 0.1, -5.0]], dtype=jnp.float64)
            d = jnp.array([[0.0, 0.0, 1.0]], dtype=jnp.float64)

            key = jax.random.PRNGKey(0)
            tang = jax.random.normal(key, ms.vertices.shape, jnp.float64)
            tang = tang / jnp.linalg.norm(tang)

            def f_scalar(eps):
                m = ms.with_vertices(ms.vertices + eps * tang)
                res = render_transparent(o, d, m, fn, IOR, EXT)
                return jnp.sum(res.direction * jnp.array([1.0, 0.7, 0.3]))

            g_ad = jax.grad(f_scalar)(0.0)
            h = 1e-6
            g_fd = (f_scalar(h) - f_scalar(-h)) / (2 * h)
            np.testing.assert_allclose(float(g_ad), float(g_fd),
                                       rtol=1e-4, atol=1e-8)
        finally:
            jax.config.update("jax_enable_x64", False)


class TestSoAFallbackParity:
    """The >_AOS_GATHER_MAX SoA gather branch of _bounce must match the AoS
    fast path exactly — value AND gradient (ADVICE.md round 3: the branch
    was otherwise unexercised by any test)."""

    def _run(self, monkeypatch, aos_max):
        from drt_tpu.render import trace as trace_mod
        monkeypatch.setattr(trace_mod, "_AOS_GATHER_MAX", aos_max)
        v, f = make_icosphere(subdivisions=2)
        ms = build_mesh_state(v, f)
        fn = get_intersect_fn("brute")
        xs = np.linspace(-0.4, 0.95, 24)
        o = jnp.array([[x, 0.05, -5.0] for x in xs])
        d = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), o.shape)

        res = render_transparent(o, d, ms, fn, IOR, EXT)

        def loss(verts):
            m = ms.with_vertices(verts)
            r = render_transparent(o, d, m, fn, IOR, EXT)
            return jnp.sum(r.direction) + jnp.sum(r.origin)

        g = jax.grad(loss)(ms.vertices)
        return res, g

    def test_soa_branch_matches_aos(self, monkeypatch):
        res_fast, g_fast = self._run(monkeypatch, 2 ** 21)
        res_soa, g_soa = self._run(monkeypatch, 4)   # force the SoA branch
        np.testing.assert_array_equal(np.asarray(res_fast.valid),
                                      np.asarray(res_soa.valid))
        np.testing.assert_allclose(np.asarray(res_fast.origin),
                                   np.asarray(res_soa.origin),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(res_fast.direction),
                                   np.asarray(res_soa.direction),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_soa),
                                   rtol=1e-5, atol=1e-6)

    def test_shard_count_scales_threshold(self, monkeypatch):
        """ray_shard_count=n multiplies the AoS threshold: a batch of
        24 rays with threshold 4 but 8 shards stays on the AoS path (the
        branch choice is observable through the module flag trick below)."""
        from drt_tpu.render import trace as trace_mod
        calls = []
        real_mt = trace_mod.moller_trumbore_verts

        def spy_mt(*a, **k):
            calls.append("aos")
            return real_mt(*a, **k)

        monkeypatch.setattr(trace_mod, "moller_trumbore_verts", spy_mt)
        monkeypatch.setattr(trace_mod, "_AOS_GATHER_MAX", 4)
        v, f = make_icosphere(subdivisions=1)
        ms = build_mesh_state(v, f)
        fn = get_intersect_fn("brute")
        o = jnp.zeros((24, 3)) + jnp.array([0.0, 0.0, -5.0])
        d = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), o.shape)
        render_transparent(o, d, ms, fn, IOR, EXT, ray_shard_count=8)
        assert calls  # 24 <= 4*8 -> AoS path taken
        calls.clear()
        render_transparent(o, d, ms, fn, IOR, EXT, ray_shard_count=1)
        assert not calls  # 24 > 4*1 -> SoA path taken


class TestGatherTri9:
    """The custom-vjp [N,9] triangle gather: both forward routes (soup for
    ray-dominated, direct for face-dominated) must equal the plain AoS
    gather in value and gradient (the bwd is a hand-pinned transpose)."""

    def test_both_routes_value_and_grad(self):
        import numpy as np
        from drt_tpu.render.trace import _gather_tri9
        rng = np.random.default_rng(0)
        V, F = 50, 40
        v = jnp.asarray(rng.normal(size=(V, 3)), jnp.float32)
        f = jnp.asarray(rng.integers(0, V, (F, 3)), jnp.int32)
        for N in (20, 200):          # N<F direct route, N>=F soup route
            sid = jnp.asarray(rng.integers(0, F, (N,)), jnp.int32)
            cot = jnp.asarray(rng.normal(size=(N, 9)), jnp.float32)
            got = _gather_tri9(v, f, sid)
            want = v[f[sid]].reshape(-1, 9)
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
            g1 = jax.jit(jax.grad(
                lambda vv: jnp.sum(_gather_tri9(vv, f, sid) * cot)))(v)
            g2 = jax.grad(
                lambda vv: jnp.sum(vv[f[sid]].reshape(-1, 9) * cot))(v)
            # scatter accumulation order differs between the routes ->
            # f32 rounding noise
            np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                       rtol=1e-5, atol=1e-5)


class TestDebugMode:
    """DRT_TPU_DEBUG=1 (reference `debug` flag, DiffRender.py:15) stages the
    TIR FrDielectric/Refract cross-check (DiffRender.py:524-525) and
    per-bounce finite asserts into the traced computation."""

    def test_clean_trace_identical_and_silent(self, monkeypatch, capfd):
        ms = cube_scene()
        fn = get_intersect_fn("brute")
        o = jnp.array([[0.1, 0.2, -5.0], [0.3, -0.1, -5.0]])
        d = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), o.shape)
        res_plain = render_transparent(o, d, ms, fn, IOR, EXT)
        monkeypatch.setenv("DRT_TPU_DEBUG", "1")
        res_dbg = render_transparent(o, d, ms, fn, IOR, EXT)
        jax.block_until_ready(res_dbg.direction)
        np.testing.assert_array_equal(np.asarray(res_plain.valid),
                                      np.asarray(res_dbg.valid))
        np.testing.assert_allclose(np.asarray(res_plain.direction),
                                   np.asarray(res_dbg.direction), rtol=1e-7)
        captured = capfd.readouterr()
        assert "VIOLATION" not in captured.out + captured.err

    def test_violation_prints(self, monkeypatch, capfd):
        """Force a violated invariant through the same reporting path."""
        from drt_tpu.render.trace import _debug_check
        _debug_check(jnp.array([True, False, False]), "forced")
        jax.effects_barrier()
        captured = capfd.readouterr()
        assert "DRT_TPU_DEBUG VIOLATION [forced]: 2 lanes" in captured.out
