"""Host-side mesh topology extraction (numpy).

Replaces the trimesh queries the reference relies on:
- watertightness check            (reference DiffRender.py:305)
- unique undirected edges + the 2 faces adjacent to each edge
  (reference `init_edge`, DiffRender.py:338-355, via
  trimesh.grouping.group_rows(mesh.edges_sorted, 2))
- vertex 1-ring neighbors for the uniform Laplacian
  (reference `init_weightM`, DiffRender.py:357-370)

Topology is recomputed only when connectivity changes (after a remesh pass);
per-iteration vertex updates reuse it, mirroring the reference's split between
`update_mesh` and `update_verticex` (DiffRender.py:303-384).
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass(frozen=True)
class MeshTopology:
    """Connectivity of a watertight triangle mesh (all numpy, unpadded)."""

    num_vertices: int
    faces: np.ndarray          # [F,3] int32
    edges: np.ndarray          # [E,2] int32, unique undirected, sorted pairs
    edge_faces: np.ndarray     # [E,2] int32 — the two faces adjacent to each edge
    neighbors: np.ndarray      # [V,D] int32 padded vertex 1-ring (pad = -1)
    neighbor_counts: np.ndarray  # [V] int32
    is_watertight: bool

    @property
    def num_faces(self) -> int:
        return len(self.faces)

    @property
    def num_edges(self) -> int:
        return len(self.edges)


def morton_order_faces(vertices: np.ndarray, faces: np.ndarray) -> np.ndarray:
    """Reorder faces along a Morton (Z-order) curve of their centroids.

    Spatially adjacent triangles become adjacent in memory, so the fixed-size
    triangle chunks used by the culled/Pallas intersect backends get tight
    bounding boxes. Semantically a face permutation is a no-op; it replaces
    the BVH build step of the reference's OptiX backend (optix_extend.cpp:61-67)
    with a once-per-topology host-side sort.
    """
    cent = vertices[faces].mean(axis=1)
    lo = cent.min(axis=0)
    span = np.maximum(cent.max(axis=0) - lo, 1e-12)
    q = np.clip(((cent - lo) / span * 1023.0).astype(np.uint64), 0, 1023)

    def spread(x):
        x = (x | (x << 16)) & np.uint64(0x030000FF)
        x = (x | (x << 8)) & np.uint64(0x0300F00F)
        x = (x | (x << 4)) & np.uint64(0x030C30C3)
        x = (x | (x << 2)) & np.uint64(0x09249249)
        return x

    code = spread(q[:, 0]) | (spread(q[:, 1]) << np.uint64(1)) \
        | (spread(q[:, 2]) << np.uint64(2))
    return faces[np.argsort(code, kind="stable")]


def build_topology(faces: np.ndarray, num_vertices: int) -> MeshTopology:
    faces = np.asarray(faces, dtype=np.int32)
    F = len(faces)

    # Directed edges in winding order; directed edge i belongs to face i % F.
    directed = np.concatenate(
        [faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]], axis=0
    )
    face_of_edge = np.concatenate([np.arange(F)] * 3).astype(np.int32)
    edges_sorted = np.sort(directed, axis=1)

    # Group identical undirected edges.
    order = np.lexsort((edges_sorted[:, 1], edges_sorted[:, 0]))
    es = edges_sorted[order]
    fs = face_of_edge[order]
    new_group = np.ones(len(es), dtype=bool)
    new_group[1:] = np.any(es[1:] != es[:-1], axis=1)
    group_starts = np.nonzero(new_group)[0]
    group_sizes = np.diff(np.append(group_starts, len(es)))

    # Watertight = closed orientable 2-manifold: every undirected edge shared
    # by exactly two faces, every directed edge unique (consistent winding),
    # no degenerate faces, and no duplicate faces. The last two are NOT
    # implied by edge counts: two faces over the same vertex triple with
    # opposite winding (a "pillow", the collapse tetra-endgame artifact —
    # see native/remesh.cpp) keep all edge counts at 2 yet explode into
    # 4-face edges when later split.
    degenerate = bool(np.any(directed[:, 0] == directed[:, 1]))
    dir_unique = len(np.unique(directed[:, 0].astype(np.int64)
                               * max(num_vertices, 1)
                               + directed[:, 1], axis=0)) == len(directed)
    tri_sorted = np.sort(faces, axis=1)
    faces_unique = len(np.unique(tri_sorted, axis=0)) == F
    watertight = (bool(np.all(group_sizes == 2)) and F > 0
                  and not degenerate and dir_unique and faces_unique)
    # Keep only edges shared by exactly two faces (all of them if watertight).
    pair_mask = group_sizes == 2
    starts2 = group_starts[pair_mask]
    edges = es[starts2].astype(np.int32)               # [E,2]
    edge_faces = np.stack([fs[starts2], fs[starts2 + 1]], axis=1).astype(np.int32)

    # Vertex 1-ring adjacency from unique edges (symmetric).
    src = np.concatenate([edges[:, 0], edges[:, 1]])
    dst = np.concatenate([edges[:, 1], edges[:, 0]])
    deg = np.bincount(src, minlength=num_vertices).astype(np.int32)
    D = int(deg.max()) if len(deg) and deg.max() > 0 else 1
    neighbors = np.full((num_vertices, D), -1, dtype=np.int32)
    order2 = np.argsort(src, kind="stable")
    src_s, dst_s = src[order2], dst[order2]
    # slot index within each vertex's neighbor row
    slot = np.arange(len(src_s)) - np.repeat(
        np.concatenate([[0], np.cumsum(deg)[:-1]]), deg
    )
    neighbors[src_s, slot] = dst_s

    return MeshTopology(
        num_vertices=num_vertices,
        faces=faces,
        edges=edges,
        edge_faces=edge_faces,
        neighbors=neighbors,
        neighbor_counts=deg,
        is_watertight=watertight,
    )


def mean_edge_length(vertices: np.ndarray, edges: np.ndarray) -> float:
    """Mean undirected edge length (reference DiffRender.py:343-345 uses the
    directed-edge mean; over a closed mesh both give the same value)."""
    d = vertices[edges[:, 0]] - vertices[edges[:, 1]]
    return float(np.linalg.norm(d, axis=1).mean())
