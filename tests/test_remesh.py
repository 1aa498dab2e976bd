"""Isotropic remesher: watertightness preservation, edge-length targeting,
surface fidelity; plus Hausdorff evaluation sanity."""

import numpy as np
import pytest

from drt_tpu.mesh.topology import build_topology
from drt_tpu.remesh import isotropic_remesh, hausdorff_distance
from drt_tpu.remesh.surface import SurfaceIndex, closest_point_on_triangles
from tests.meshes import make_icosphere, make_cube


def check_watertight(v, f):
    topo = build_topology(np.asarray(f), len(v))
    assert topo.is_watertight
    return topo


class TestSurface:
    def test_closest_point_interior(self):
        tri = np.array([[[0.0, 0, 0], [2, 0, 0], [0, 2, 0]]])
        p = np.array([[0.5, 0.5, 3.0]])
        cp = closest_point_on_triangles(p, tri)
        np.testing.assert_allclose(cp, [[0.5, 0.5, 0.0]], atol=1e-12)

    def test_closest_point_vertex_edge(self):
        tri = np.array([[[0.0, 0, 0], [2, 0, 0], [0, 2, 0]]] * 2)
        p = np.array([[-1.0, -1.0, 1.0],   # vertex A region
                      [1.0, -2.0, 0.0]])   # edge AB region
        cp = closest_point_on_triangles(p, tri)
        np.testing.assert_allclose(cp[0], [0, 0, 0], atol=1e-12)
        np.testing.assert_allclose(cp[1], [1, 0, 0], atol=1e-12)

    def test_surface_index_sphere(self):
        v, f = make_icosphere(subdivisions=3, radius=10.0)
        s = SurfaceIndex(v, f)
        rng = np.random.default_rng(0)
        p = rng.normal(size=(100, 3))
        p = p / np.linalg.norm(p, axis=1, keepdims=True) * 15.0
        cp, d = s.closest_points(p)
        np.testing.assert_allclose(d, 5.0, atol=0.1)
        np.testing.assert_allclose(np.linalg.norm(cp, axis=1), 10.0, atol=0.1)


class TestRemesh:
    def test_refine_sphere(self):
        """Coarse sphere + small target length: splits dominate; result is
        watertight with edge lengths near target."""
        v, f = make_icosphere(subdivisions=1, radius=10.0)
        v2, f2 = isotropic_remesh(v, f, target_len=2.0)
        topo = check_watertight(v2, f2)
        e = np.linalg.norm(v2[topo.edges[:, 0]] - v2[topo.edges[:, 1]], axis=1)
        assert len(f2) > len(f)
        assert e.mean() == pytest.approx(2.0, rel=0.5)
        # surface fidelity: vertices stay on the ORIGINAL (faceted) surface
        _, d = SurfaceIndex(v, f).closest_points(v2)
        assert d.max() < 0.05
        r = np.linalg.norm(v2, axis=1)
        assert r.max() < 10.0 + 1e-6 and r.min() > 9.0

    def test_coarsen_sphere(self):
        """Fine sphere + large target length: collapses dominate."""
        v, f = make_icosphere(subdivisions=4, radius=10.0)
        v2, f2 = isotropic_remesh(v, f, target_len=3.0)
        topo = check_watertight(v2, f2)
        assert len(f2) < len(f)
        e = np.linalg.norm(v2[topo.edges[:, 0]] - v2[topo.edges[:, 1]], axis=1)
        assert e.mean() == pytest.approx(3.0, rel=0.5)
        r = np.linalg.norm(v2, axis=1)
        assert np.abs(r - 10.0).max() < 1.0

    def test_cube_stays_closed(self):
        v, f = make_cube(size=10.0)
        v2, f2 = isotropic_remesh(v, f, target_len=2.0)
        check_watertight(v2, f2)
        assert np.abs(v2).max() <= 5.0 + 1e-6

    def test_reference_mesh_lod_sequence(self):
        """Drive the hand visual hull through a shrinking LOD sequence like
        the optimization loop does (reference optim.py:190-195)."""
        from drt_tpu.mesh import load_ply
        v, f = load_ply("/root/reference/data/hand_vh.ply")
        for L in [10.0, 6.0]:
            v, f = isotropic_remesh(v, f, target_len=L)
            topo = check_watertight(v, f)
            e = np.linalg.norm(v[topo.edges[:, 0]] - v[topo.edges[:, 1]],
                               axis=1)
            # isotropy: most edges within the Botsch-Kobbelt band
            frac = ((e > 0.5 * L) & (e < 1.6 * L)).mean()
            assert frac > 0.8, (L, frac)


class TestHausdorff:
    def test_identical_zero(self):
        v, f = make_icosphere(subdivisions=2, radius=5.0)
        st = hausdorff_distance(v, f, v, f)
        assert st.max < 1e-9

    def test_concentric_spheres(self):
        v1, f1 = make_icosphere(subdivisions=3, radius=10.0)
        v2, f2 = make_icosphere(subdivisions=3, radius=11.0)
        st = hausdorff_distance(v1, f1, v2, f2)
        assert st.mean == pytest.approx(1.0, abs=0.15)


class TestNativeCore:
    def test_native_available_and_matches_fallback_semantics(self):
        """The C++ core and the numpy fallback both satisfy the remesh
        contract (watertight, edge band, surface fidelity) on the same
        input."""
        from drt_tpu.remesh.native import load_native
        assert load_native() is not None, "native core failed to build"
        v, f = make_icosphere(subdivisions=2, radius=10.0)
        for use_native in (True, False):
            v2, f2 = isotropic_remesh(v, f, target_len=1.5,
                                      use_native=use_native)
            topo = check_watertight(v2, f2)
            e = np.linalg.norm(v2[topo.edges[:, 0]] - v2[topo.edges[:, 1]],
                               axis=1)
            assert 0.9 < e.mean() < 2.2, (use_native, e.mean())
            _, d = SurfaceIndex(v, f).closest_points(v2)
            assert d.max() < 0.05

    def test_native_large_coarsen(self):
        from drt_tpu.remesh.native import load_native
        if load_native() is None:
            import pytest
            pytest.skip("no toolchain")
        v, f = make_icosphere(subdivisions=5, radius=10.0)  # 20480 faces
        v2, f2 = isotropic_remesh(v, f, target_len=3.0)
        topo = check_watertight(v2, f2)
        assert len(f2) < len(f) // 10
