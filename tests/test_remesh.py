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


class TestPillowRegression:
    """Regression tests for the collapse tetra-endgame bug (round 3).

    Collapsing edge (a,b) when faces {a,c1,c2} and {b,c1,c2} both exist
    rewrites {b,c1,c2} into a duplicate of {a,c1,c2} — a two-face "pillow"
    whose edges still count 2 (old watertight check passed) but whose later
    split explodes into 4-face edges. Observed as 100% remesh failure on
    the dog/pig quick-suite runs (VERDICT.md round 2, weak #1)."""

    def test_tetrahedron_collapse_guard(self):
        # A regular tetrahedron with all edges < lmin is the minimal
        # endgame configuration: without the guard, one collapse creates
        # the duplicated face.
        v = np.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0],
                      [0.5, 0.866, 0.0], [0.5, 0.289, 0.816]])
        f = np.array([[0, 2, 1], [0, 1, 3], [1, 2, 3], [2, 0, 3]])
        check_watertight(v, f)
        for use_native in (True, False):
            v2, f2 = isotropic_remesh(v, f, target_len=100.0,
                                      use_native=use_native,
                                      max_surf_dist=0.0, project=False)
            topo = check_watertight(v2, f2)
            s = np.sort(np.asarray(f2), axis=1)
            assert len(np.unique(s, axis=0)) == len(f2), use_native

    def test_strict_watertight_rejects_pillow(self):
        # Duplicate face pair over the same triple: edge counts are all 2
        # but the mesh is degenerate — the strict check must reject it.
        v = np.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
        f = np.array([[0, 1, 2], [0, 2, 1]])
        assert not build_topology(f, len(v)).is_watertight

    def test_remove_duplicate_face_pairs(self):
        from drt_tpu.remesh.isotropic import remove_duplicate_face_pairs
        v, f = make_icosphere(subdivisions=1, radius=1.0)
        # graft a floating pillow: 3 extra vertices, 2 identical faces
        nv = len(v)
        v2 = np.concatenate([v, [[5, 0, 0], [6, 0, 0], [5, 1, 0]]])
        f2 = np.concatenate([f, [[nv, nv + 1, nv + 2], [nv, nv + 2, nv + 1]]])
        assert not build_topology(f2, len(v2)).is_watertight
        v3, f3 = remove_duplicate_face_pairs(v2, f2)
        assert len(f3) == len(f) and len(v3) == len(v)
        check_watertight(v3, f3)

    def test_corrupted_dog_checkpoint_fixture(self):
        """The real failing mesh from the round-2 dog run: pass-01
        checkpoint with one pillow pair. isotropic_remesh must repair it
        and produce a strictly watertight result at the target that failed
        in production (3.52941), with both backends."""
        from drt_tpu.mesh.ply import load_ply
        import os
        path = os.path.join(os.path.dirname(__file__), "fixtures",
                            "dog_pillow_corrupt.ply")
        v, f = load_ply(path)
        assert not build_topology(np.asarray(f), len(v)).is_watertight
        for use_native in (True, False):
            v2, f2 = isotropic_remesh(v, f, 3.52941, use_native=use_native)
            check_watertight(v2, f2)
            s = np.sort(np.asarray(f2), axis=1)
            assert len(np.unique(s, axis=0)) == len(f2), use_native
