"""PLY IO, topology extraction, and MeshState construction."""

import numpy as np
import pytest

from drt_tpu.mesh import load_ply, save_ply, build_topology, build_mesh_state
from drt_tpu.mesh.topology import mean_edge_length


def test_ply_roundtrip_binary(tmp_path, icosphere):
    v, f = icosphere
    p = str(tmp_path / "s.ply")
    save_ply(p, v, f)
    v2, f2 = load_ply(p)
    np.testing.assert_allclose(v2, v, atol=1e-6)
    np.testing.assert_array_equal(f2, f)


def test_ply_roundtrip_ascii(tmp_path, cube_mesh):
    v, f = cube_mesh
    p = str(tmp_path / "c.ply")
    save_ply(p, v, f, binary=False)
    v2, f2 = load_ply(p)
    np.testing.assert_allclose(v2, v, atol=1e-6)
    np.testing.assert_array_equal(f2, f)


def test_load_reference_data():
    """The bundled reference PLYs load with the published V/F counts
    (BASELINE.md dataset table)."""
    v, f = load_ply("/root/reference/data/mouse_vh.ply")
    assert v.shape == (4625, 3)
    assert f.shape == (9246, 3)
    # scan mesh with extra 'quality' property
    v, f = load_ply("/root/reference/data/mouse_scan.ply")
    assert v.shape == (52504, 3)
    assert f.shape == (105004, 3)


def test_topology_cube(cube_mesh):
    v, f = cube_mesh
    topo = build_topology(f, len(v))
    assert topo.is_watertight
    # Euler: V - E + F = 2 for a sphere-topology mesh
    assert len(v) - topo.num_edges + topo.num_faces == 2
    assert topo.num_edges == 18
    # every edge has two distinct adjacent faces
    assert np.all(topo.edge_faces[:, 0] != topo.edge_faces[:, 1])
    # neighbor table symmetric: b in N(a) <=> a in N(b)
    for a in range(len(v)):
        for b in topo.neighbors[a]:
            if b < 0:
                continue
            assert a in topo.neighbors[b]


def test_topology_icosphere(icosphere):
    v, f = icosphere
    topo = build_topology(f, len(v))
    assert topo.is_watertight
    assert len(v) - topo.num_edges + topo.num_faces == 2


def test_topology_open_mesh_not_watertight():
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], dtype=np.float64)
    f = np.array([[0, 1, 2]], dtype=np.int64)
    topo = build_topology(f, 3)
    assert not topo.is_watertight


def test_mesh_state_build(icosphere):
    v, f = icosphere
    ms = build_mesh_state(v, f)
    assert ms.num_vertices == len(v)
    assert ms.num_faces == len(f)
    # padding is power-of-two bucketed
    assert ms.vertices.shape[0] >= len(v)
    assert (ms.vertices.shape[0] & (ms.vertices.shape[0] - 1)) == 0
    assert bool(ms.face_valid[: ms.num_faces].all())
    assert not bool(ms.face_valid[ms.num_faces:].any())
    # vertex normals of a sphere point radially outward
    import numpy as np
    n = np.asarray(ms.normals[: ms.num_vertices])
    radial = v / np.linalg.norm(v, axis=1, keepdims=True)
    cos = np.sum(n * radial, axis=1)
    assert cos.min() > 0.99


def test_mesh_state_rejects_open_mesh():
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], dtype=np.float64)
    f = np.array([[0, 1, 2]], dtype=np.int64)
    with pytest.raises(ValueError):
        build_mesh_state(v, f)


def test_mean_edge_length(cube_mesh):
    v, f = cube_mesh
    topo = build_topology(f, len(v))
    m = mean_edge_length(v, topo.edges)
    # cube of size 1: 12 edges of length 1, 6 diagonals of length sqrt(2)
    expect = (12 * 1.0 + 6 * np.sqrt(2)) / 18
    assert abs(m - expect) < 1e-12
