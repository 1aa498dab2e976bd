"""Space carving (data/carve.py): occupancy, surface nets, end-to-end hull
consistency with the capture that produced the masks."""

import numpy as np
import pytest

from drt_tpu.data import synthesize_capture
from drt_tpu.data.carve import carved_visual_hull, surface_nets
from drt_tpu.mesh.topology import build_topology
from drt_tpu.remesh.hausdorff import hausdorff_distance
from tests.meshes import make_icosphere


def test_surface_nets_sphere_sdf():
    """Extract a sphere from its analytic field: watertight, outward
    normals, radius within a voxel."""
    n = 48
    ax = np.linspace(-1.2, 1.2, n)
    gx, gy, gz = np.meshgrid(ax, ax, ax, indexing="ij")
    r = np.sqrt(gx ** 2 + gy ** 2 + gz ** 2)
    field = 1.0 - r                     # >0 inside unit sphere; iso 0
    origin = np.array([-1.2, -1.2, -1.2])
    spacing = np.full(3, ax[1] - ax[0])
    v, f = surface_nets(field, origin, spacing, iso=0.0)

    topo = build_topology(f, len(v))
    assert topo.is_watertight
    rad = np.linalg.norm(v, axis=1)
    assert abs(rad.mean() - 1.0) < 0.05
    # outward orientation: signed volume positive and near 4/3 pi
    tri = v[f]
    vol = np.einsum("ij,ij->", np.cross(tri[:, 0], tri[:, 1]), tri[:, 2]) / 6
    assert abs(vol - 4.0 / 3.0 * np.pi) < 0.4


@pytest.fixture(scope="module")
def sphere_capture():
    gt_v, gt_f = make_icosphere(subdivisions=3, radius=50.0)
    cap = synthesize_capture(gt_v, gt_f, num_views=24, resy=96, resx=96,
                             ior=1.5, backend="brute", num_view_used=24)
    return gt_v, gt_f, cap


def test_carved_hull_contains_and_approximates(sphere_capture):
    gt_v, gt_f, cap = sphere_capture
    c = gt_v.mean(0)
    lo, hi = c - 65.0, c + 65.0
    v, f = carved_visual_hull(cap, lo, hi, resolution=96, target_len=8.0)
    topo = build_topology(f.astype(np.int64), len(v))
    assert topo.is_watertight

    # Hull approximates a convex object tightly (sub-voxel mean distance)
    h = hausdorff_distance(v, f, gt_v, gt_f)
    assert h.mean < 1.5, h
    # Visual-hull property: carved surface stays outside-or-near the object
    # (distances measured from hull vertices to the object must never be
    # deeply *inside*; for a convex object, hull ~ object so just tightness)
    assert h.max < 8.0, h


def test_carved_hull_wide_aspect_rejects_out_of_frustum_slabs():
    """Regression (round-2 pig failure): at a wide aspect ratio the carve
    volume's corners above/below every view's vertical frustum are never
    carved; they must not survive as the 'largest component' in place of the
    object. Voxels not observed by every view are rejected."""
    gt_v, gt_f = make_icosphere(subdivisions=3, radius=50.0)
    # 24x96 (4:1) frame: vertical half-fov atan(12/116) ~ 6 deg, so most of
    # an oversized carve volume is never in frame vertically.
    cap = synthesize_capture(gt_v, gt_f, num_views=12, resy=24, resx=96,
                             ior=1.5, backend="brute", num_view_used=12)
    c = gt_v.mean(0)
    lo, hi = c - 110.0, c + 110.0        # much taller than the frustum slab
    v, f = carved_visual_hull(cap, lo, hi, resolution=64, target_len=10.0)
    topo = build_topology(f.astype(np.int64), len(v))
    assert topo.is_watertight
    # the hull is the sphere, not an out-of-frustum slab
    assert np.all(np.abs(v - c) < 70.0), (v.min(0), v.max(0))
    # H is loose by construction: at 4:1 the sphere itself overflows the
    # frame vertically (angular radius atan(1/3.5) ~ 16 deg > the ~6 deg
    # vertical half-fov), so the hull is clipped. The regression under test
    # is slab rejection (the bbox assert), not hull tightness.
    h = hausdorff_distance(v, f, gt_v, gt_f)
    assert h.mean < 25.0, h


def test_rig_working_volume_contains_object(sphere_capture):
    """The GT-free carving volume (least-squares optical-axis intersection +
    frustum-scale half extent) must contain the object — this is what lets
    `cli carve` / `reconstruct --init carved` run on real .h5 captures that
    have no ground-truth mesh."""
    from drt_tpu.data.carve import carved_visual_hull, rig_working_volume

    gt_v, gt_f, cap = sphere_capture
    lo, hi = rig_working_volume(cap)
    assert np.all(gt_v > lo + 1.0) and np.all(gt_v < hi - 1.0), (lo, hi)
    v, f = carved_visual_hull(cap, lo, hi, resolution=64, target_len=10.0)
    topo = build_topology(f.astype(np.int64), len(v))
    assert topo.is_watertight
    h = hausdorff_distance(v, f, gt_v, gt_f)
    assert h.mean < 4.0, h
