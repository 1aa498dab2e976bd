"""Pallas closest-hit kernel vs the brute oracle (interpreter mode on CPU;
the same code compiles with Mosaic on TPU — benchmarked in BASELINE.md)."""

import jax.numpy as jnp
import numpy as np

from drt_tpu.intersect.brute import intersect_brute
from drt_tpu.intersect.pallas_kernel import intersect_pallas
from drt_tpu.mesh import build_mesh_state
from tests.meshes import make_cube, make_icosphere
from tests.test_culled import scene_rays


def _check(ms, o, d, mismatch_tol=0):
    hb = intersect_brute(o, d, ms.vertices, ms.faces, ms.face_valid)
    hp = intersect_pallas(o, d, ms.vertices, ms.faces, ms.face_valid,
                          interpret=True)
    hr, hn = np.asarray(hb.hit), np.asarray(hp.hit)
    assert (hr != hn).sum() <= mismatch_tol
    both = hr & hn
    np.testing.assert_allclose(np.asarray(hp.t)[both],
                               np.asarray(hb.t)[both], rtol=1e-5, atol=1e-4)


def test_cube():
    v, f = make_cube(size=80.0)
    ms = build_mesh_state(v, f)
    o, d = scene_rays(600, seed=2)
    _check(ms, o, d)


def test_sphere_multichunk():
    v, f = make_icosphere(subdivisions=4, radius=50.0)
    ms = build_mesh_state(v, f)
    o, d = scene_rays(1024, seed=3)
    _check(ms, o, d, mismatch_tol=2)


def test_inside_rays():
    v, f = make_icosphere(subdivisions=3, radius=50.0)
    ms = build_mesh_state(v, f)
    rng = np.random.default_rng(5)
    o = jnp.asarray(rng.uniform(-20, 20, (300, 3)), jnp.float32)
    d = rng.normal(size=(300, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    _check(ms, o, jnp.asarray(d, jnp.float32), mismatch_tol=1)


def test_streaming_variant_matches_brute(monkeypatch):
    """Force the HBM-streaming double-buffered path (used for meshes whose
    coefficient tensor exceeds VMEM) and verify it against brute."""
    import drt_tpu.intersect.pallas_kernel as PK
    monkeypatch.setattr(PK, "VMEM_COEF_LIMIT_BYTES", 1024)
    v, f = make_icosphere(subdivisions=4, radius=50.0)
    ms = build_mesh_state(v, f)
    o, d = scene_rays(512, seed=7)
    hb = intersect_brute(o, d, ms.vertices, ms.faces, ms.face_valid)
    hp = PK.intersect_pallas(o, d, ms.vertices, ms.faces, ms.face_valid,
                             interpret=True)
    np.testing.assert_array_equal(np.asarray(hb.hit), np.asarray(hp.hit))
    both = np.asarray(hb.hit)
    np.testing.assert_allclose(np.asarray(hp.t)[both],
                               np.asarray(hb.t)[both], rtol=1e-5, atol=1e-4)


def test_tile_prepass_matches_brute():
    """The tile-frustum prepass emits a conservative candidate SUPERSET;
    results must still be exact (the kernel re-runs the per-ray slab test).
    scene_rays is fully incoherent — the worst case for the tile test."""
    v, f = make_icosphere(subdivisions=4, radius=50.0)
    ms = build_mesh_state(v, f)
    o, d = scene_rays(1024, seed=11)
    hb = intersect_brute(o, d, ms.vertices, ms.faces, ms.face_valid)
    hp = intersect_pallas(o, d, ms.vertices, ms.faces, ms.face_valid,
                          prepass="tile", interpret=True)
    hr, hn = np.asarray(hb.hit), np.asarray(hp.hit)
    assert (hr != hn).sum() <= 2
    both = hr & hn
    np.testing.assert_allclose(np.asarray(hp.t)[both],
                               np.asarray(hb.t)[both], rtol=1e-5, atol=1e-4)


def test_tile_prepass_superset_of_ray_prepass():
    """Every chunk the per-ray prepass selects must appear among the tile
    prepass's first `count` candidates (completeness of the cheap test)."""
    import jax
    from drt_tpu.intersect.culled import _chunk_aabbs
    from drt_tpu.intersect.pallas_kernel import (_candidates,
                                                 _candidates_tile)
    v, f = make_icosphere(subdivisions=4, radius=50.0)
    ms = build_mesh_state(v, f)
    o, d = scene_rays(1024, seed=13)
    shift = jnp.mean(o, axis=0)
    lo_c, hi_c, cv = _chunk_aabbs(ms.vertices, ms.faces, ms.face_valid,
                                  shift, 128)
    ot = (o - shift).reshape(2, 512, 3).transpose(0, 2, 1)
    dt = d.reshape(2, 512, 3).transpose(0, 2, 1)
    c_ray, n_ray = jax.jit(_candidates)(ot, dt, lo_c, hi_c, cv, 0.0)
    c_til, n_til = jax.jit(_candidates_tile)(ot, dt, lo_c, hi_c, cv, 0.0)
    for t in range(2):
        ray_set = set(np.asarray(c_ray[t, 0, :int(n_ray[t, 0])]).tolist())
        til_set = set(np.asarray(c_til[t, 0, :int(n_til[t, 0])]).tolist())
        assert ray_set <= til_set


def test_group_hierarchy_matches_brute():
    """Second hierarchy level (VERDICT r3 item 8): with group>1 the prepass
    tests only group AABBs and the kernel expands each candidate group to
    its chunks — results must stay exact (per-ray chunk slab re-test).
    Includes a group size that doesn't divide the chunk count (padding)."""
    v, f = make_icosphere(subdivisions=4, radius=50.0)
    ms = build_mesh_state(v, f)
    o, d = scene_rays(1024, seed=17)
    hb = intersect_brute(o, d, ms.vertices, ms.faces, ms.face_valid)
    for g in (4, 7):
        for prepass in ("ray", "tile"):
            hp = intersect_pallas(o, d, ms.vertices, ms.faces,
                                  ms.face_valid, prepass=prepass, group=g,
                                  interpret=True)
            hr, hn = np.asarray(hb.hit), np.asarray(hp.hit)
            assert (hr != hn).sum() <= 2, (g, prepass)
            both = hr & hn
            np.testing.assert_allclose(np.asarray(hp.t)[both],
                                       np.asarray(hb.t)[both],
                                       rtol=1e-5, atol=1e-4)


def test_group_hierarchy_streaming_matches_brute(monkeypatch):
    """group>1 through the HBM-streaming double-buffered kernel (the path
    large meshes take, where the hierarchy matters most)."""
    import drt_tpu.intersect.pallas_kernel as PK
    monkeypatch.setattr(PK, "VMEM_COEF_LIMIT_BYTES", 1024)
    v, f = make_icosphere(subdivisions=4, radius=50.0)
    ms = build_mesh_state(v, f)
    o, d = scene_rays(512, seed=19)
    hb = intersect_brute(o, d, ms.vertices, ms.faces, ms.face_valid)
    hp = PK.intersect_pallas(o, d, ms.vertices, ms.faces, ms.face_valid,
                             group=4, interpret=True)
    np.testing.assert_array_equal(np.asarray(hb.hit), np.asarray(hp.hit))
    both = np.asarray(hb.hit)
    np.testing.assert_allclose(np.asarray(hp.t)[both],
                               np.asarray(hb.t)[both], rtol=1e-5, atol=1e-4)


def test_tuned_params_lookup(tmp_path, monkeypatch):
    """tuned_params picks the best row of the nearest mesh-size regime and
    intersect_pallas falls back to module defaults with no table."""
    import json
    from drt_tpu.intersect import pallas_kernel as pk

    rows = [
        {"mesh": "small", "faces": 10000, "ray_tile": 256, "tri_chunk": 64,
         "prepass": "tile", "oracle_ms": 5.0},
        {"mesh": "small", "faces": 10000, "ray_tile": 512, "tri_chunk": 128,
         "prepass": "ray", "oracle_ms": 9.0},
        {"mesh": "big", "faces": 150000, "ray_tile": 1024, "tri_chunk": 256,
         "prepass": "ray", "oracle_ms": 80.0},
    ]
    p = tmp_path / "kernel_tuning.json"
    p.write_text(json.dumps(rows))
    monkeypatch.setattr(pk, "_TUNING_PATH", str(p))
    pk._tuning_table.cache_clear()
    try:
        assert pk.tuned_params(9000) == {
            "ray_tile": 256, "tri_chunk": 64, "prepass": "tile", "group": 1}
        assert pk.tuned_params(200000) == {
            "ray_tile": 1024, "tri_chunk": 256, "prepass": "ray", "group": 1}
        # corrupt / absent table -> {} (module defaults)
        monkeypatch.setattr(pk, "_TUNING_PATH", str(tmp_path / "absent.json"))
        pk._tuning_table.cache_clear()
        assert pk.tuned_params(9000) == {}
        # tuned defaults still give exact hits (interpret mode, vs brute)
        monkeypatch.setattr(pk, "_TUNING_PATH", str(p))
        pk._tuning_table.cache_clear()
        v, f = make_icosphere(subdivisions=3, radius=50.0)
        ms = build_mesh_state(v, f)
        o, d = scene_rays(512, seed=7)
        hb = intersect_brute(o, d, ms.vertices, ms.faces, ms.face_valid)
        hp = pk.intersect_pallas(o, d, ms.vertices, ms.faces, ms.face_valid,
                                 interpret=True)
        np.testing.assert_array_equal(np.asarray(hb.tri_id),
                                      np.asarray(hp.tri_id))
    finally:
        pk._tuning_table.cache_clear()


def test_resort_incoherent_matches_brute():
    """The Morton re-sort wrapper (intersect/resort.py): sorted-tile
    frustum-prepass oracle scattered back to original lane order must equal
    the brute oracle exactly — incoherent ray soup, both octant-mixed
    directions and clustered origins."""
    from drt_tpu.intersect.resort import resorted_intersect, morton_keys

    v, f = make_icosphere(subdivisions=3, radius=60.0)
    ms = build_mesh_state(v, f)
    o, d = scene_rays(1500, seed=7)          # fully incoherent soup
    hb = intersect_brute(o, d, ms.vertices, ms.faces, ms.face_valid)

    def fn(o, d, vtx, fcs, fv, **kw):
        return intersect_pallas(o, d, vtx, fcs, fv, interpret=True,
                                prepass="tile", **kw)

    hr = resorted_intersect(fn, o, d, ms.vertices, ms.faces, ms.face_valid)
    np.testing.assert_array_equal(np.asarray(hb.hit), np.asarray(hr.hit))
    both = np.asarray(hb.hit)
    np.testing.assert_allclose(np.asarray(hr.t)[both],
                               np.asarray(hb.t)[both], rtol=1e-5, atol=1e-4)

    # key structure: octant-major, and sorted tiles are octant-pure
    keys = np.asarray(morton_keys(o, d))
    assert keys.min() >= 0 and keys.max() < 2 ** 30
    order = np.argsort(keys)
    octs = keys[order] >> 27
    assert (np.diff(octs) >= 0).all()


def test_resort_through_api_wrapper():
    """get_intersect_fn(..., incoherent='resort'): the coherent=False call
    routes through the re-sort and still matches the coherent result."""
    from drt_tpu.intersect import get_intersect_fn

    v, f = make_icosphere(subdivisions=2, radius=60.0)
    ms = build_mesh_state(v, f)
    o, d = scene_rays(700, seed=3)
    fn = get_intersect_fn("pallas", incoherent="resort", interpret=True)
    h_co = fn(o, d, ms.vertices, ms.faces, ms.face_valid, coherent=True)
    h_in = fn(o, d, ms.vertices, ms.faces, ms.face_valid, coherent=False)
    np.testing.assert_array_equal(np.asarray(h_co.tri_id),
                                  np.asarray(h_in.tri_id))
    np.testing.assert_allclose(np.asarray(h_co.t), np.asarray(h_in.t),
                               rtol=1e-6)
