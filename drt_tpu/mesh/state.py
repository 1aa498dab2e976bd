"""Padded, static-shape device mesh state.

TPU/XLA wants static shapes: every remesh pass changes V/F/E, which would
force a recompile per pass. We pad all topology arrays to power-of-two
buckets so passes with similar mesh sizes share compiled executables, and
carry validity masks for the padded lanes. Padded faces are the degenerate
triangle (0,0,0): zero area, never hit by the oracle, masked out of every
reduction.

This replaces the reference's mutable `Scene` object and its module-global
configuration (DiffRender.py:298-384, optim.py:178-182) with an immutable
pytree + pure update functions.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from drt_tpu.mesh.topology import (
    MeshTopology, build_topology, mean_edge_length, morton_order_faces,
)
from drt_tpu.geometry.normals import vertex_normals


def _bucket(n: int, minimum: int = 256) -> int:
    """Round up to the next power of two (>= minimum)."""
    b = minimum
    while b < n:
        b *= 2
    return b


@struct.dataclass
class MeshState:
    """Differentiable mesh state + padded topology caches.

    Shapes use padded sizes Vp/Fp/Ep; the *_valid masks mark real entries.
    `vertices` is the only array gradients flow into; everything else is
    integer topology or derived caches.
    """

    vertices: jnp.ndarray        # [Vp,3] float — autograd leaf
    faces: jnp.ndarray           # [Fp,3] int32 (padded: (0,0,0))
    face_valid: jnp.ndarray      # [Fp] bool
    vert_valid: jnp.ndarray      # [Vp] bool
    edges: jnp.ndarray           # [Ep,2] int32 (padded: (0,0))
    edge_valid: jnp.ndarray      # [Ep] bool
    edge_faces: jnp.ndarray      # [Ep,2] int32 — two faces adjacent to edge
    neighbors: jnp.ndarray       # [Vp,D] int32 (pad −1 → clamped to 0)
    neighbor_valid: jnp.ndarray  # [Vp,D] bool
    normals: jnp.ndarray         # [Vp,3] angle-weighted vertex normals
    mean_len: jnp.ndarray        # scalar — mean edge length at load time

    # static (non-pytree) metadata
    num_vertices: int = struct.field(pytree_node=False)
    num_faces: int = struct.field(pytree_node=False)
    num_edges: int = struct.field(pytree_node=False)

    @property
    def triangles(self) -> jnp.ndarray:
        """[Fp,3,3] gathered triangle vertices (differentiable)."""
        return self.vertices[self.faces]

    def with_vertices(self, vertices: jnp.ndarray) -> "MeshState":
        """Pure analog of the reference's per-iteration `update_verticex`
        (DiffRender.py:378-384): swap vertices, recompute vertex normals."""
        normals = vertex_normals(vertices, self.faces, self.face_valid)
        return self.replace(vertices=vertices, normals=normals)

    def host_arrays(self) -> tuple[np.ndarray, np.ndarray]:
        """Unpadded (vertices[V,3] f64, faces[F,3] i64) on host."""
        v = np.asarray(self.vertices[: self.num_vertices], dtype=np.float64)
        f = np.asarray(self.faces[: self.num_faces], dtype=np.int64)
        return v, f


def build_mesh_state(
    vertices: np.ndarray,
    faces: np.ndarray,
    dtype=jnp.float32,
    require_watertight: bool = True,
    topology: Optional[MeshTopology] = None,
    bucket_min: int = 256,
) -> MeshState:
    """Build a padded MeshState from host arrays (analog of `update_mesh`,
    reference DiffRender.py:303-317)."""
    vertices = np.asarray(vertices, dtype=np.float64)
    V = len(vertices)
    if topology is None:
        # Morton-order faces so chunked intersect backends cull well.
        faces = morton_order_faces(vertices, np.asarray(faces))
        topo = build_topology(faces, V)
    else:
        topo = topology
    if require_watertight and not topo.is_watertight:
        raise ValueError("mesh is not watertight")  # DiffRender.py:305

    F, E = topo.num_faces, topo.num_edges
    Vp, Fp, Ep = _bucket(V, bucket_min), _bucket(F, bucket_min), _bucket(E, bucket_min)

    v_pad = np.zeros((Vp, 3), dtype=np.float64)
    v_pad[:V] = vertices
    f_pad = np.zeros((Fp, 3), dtype=np.int32)
    f_pad[:F] = topo.faces
    e_pad = np.zeros((Ep, 2), dtype=np.int32)
    e_pad[:E] = topo.edges
    ef_pad = np.zeros((Ep, 2), dtype=np.int32)
    ef_pad[:E] = topo.edge_faces

    D = topo.neighbors.shape[1]
    nbr = np.zeros((Vp, D), dtype=np.int32)
    nbr_valid = np.zeros((Vp, D), dtype=bool)
    nbr_valid[:V] = topo.neighbors >= 0
    nbr[:V] = np.maximum(topo.neighbors, 0)

    face_valid = np.zeros(Fp, dtype=bool)
    face_valid[:F] = True
    vert_valid = np.zeros(Vp, dtype=bool)
    vert_valid[:V] = True
    edge_valid = np.zeros(Ep, dtype=bool)
    edge_valid[:E] = True

    mlen = mean_edge_length(vertices, topo.edges)

    verts_j = jnp.asarray(v_pad, dtype=dtype)
    faces_j = jnp.asarray(f_pad)
    fv_j = jnp.asarray(face_valid)
    normals = vertex_normals(verts_j, faces_j, fv_j)

    return MeshState(
        vertices=verts_j,
        faces=faces_j,
        face_valid=fv_j,
        vert_valid=jnp.asarray(vert_valid),
        edges=jnp.asarray(e_pad),
        edge_valid=jnp.asarray(edge_valid),
        edge_faces=jnp.asarray(ef_pad),
        neighbors=jnp.asarray(nbr),
        neighbor_valid=jnp.asarray(nbr_valid),
        normals=normals,
        mean_len=jnp.asarray(mlen, dtype=dtype),
        num_vertices=V,
        num_faces=F,
        num_edges=E,
    )
