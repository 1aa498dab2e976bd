"""Differentiable mesh-quality metrics (JAX).

Capabilities of the reference's TorchScript metric kernels
(DiffRender.py:123-187) plus the dihedral-angle op (DiffRender.py:440-443),
reformulated for padded static-shape meshes: every reduction takes a validity
mask so padded faces/edges contribute exactly zero.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from drt_tpu.geometry.vec import dot3, safe_normalize


def _masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    cnt = jnp.maximum(jnp.sum(mask), 1)
    return jnp.sum(jnp.where(mask, x, 0.0)) / cnt


def face_areas(triangles: jnp.ndarray) -> jnp.ndarray:
    """Twice-area actually — parallelogram norm, matching the reference's
    `JIT_area` (DiffRender.py:124-131) which omits the 1/2 factor."""
    e1 = triangles[..., 1, :] - triangles[..., 0, :]
    e2 = triangles[..., 2, :] - triangles[..., 0, :]
    return jnp.linalg.norm(jnp.cross(e1, e2), axis=-1)


def area_var(triangles: jnp.ndarray, face_valid: jnp.ndarray) -> jnp.ndarray:
    """Relative variance of face areas (reference JIT_area_var,
    DiffRender.py:134-138; mean is detached there too)."""
    area = face_areas(triangles)
    ave = jax.lax.stop_gradient(_masked_mean(area, face_valid))
    rel = (area - ave) / jnp.maximum(ave, 1e-20)
    return _masked_mean(rel * rel, face_valid)


def edge_var(vertices: jnp.ndarray, edges: jnp.ndarray,
             edge_valid: jnp.ndarray) -> jnp.ndarray:
    """Relative variance of edge lengths (reference JIT_edge_var,
    DiffRender.py:141-147)."""
    d = vertices[edges[:, 0]] - vertices[edges[:, 1]]
    ln = jnp.linalg.norm(d, axis=-1)
    ave = jax.lax.stop_gradient(_masked_mean(ln, edge_valid))
    rel = (ln - ave) / jnp.maximum(ave, 1e-20)
    return _masked_mean(rel * rel, edge_valid)


def edge_face_normals(vertices: jnp.ndarray, faces: jnp.ndarray,
                      edge_faces: jnp.ndarray):
    """Unit normals of the two faces adjacent to each edge
    (reference edge_face_norm, DiffRender.py:149-163, which takes the
    pre-gathered [E,2,3] vertex-index array; here we gather from faces)."""
    ef = faces[edge_faces]                      # [E,2,3] vertex indices
    tri = vertices[ef]                          # [E,2,3,3]
    e1 = tri[:, :, 1, :] - tri[:, :, 0, :]
    e2 = tri[:, :, 2, :] - tri[:, :, 0, :]
    n = safe_normalize(jnp.cross(e1, e2))       # [E,2,3]
    return n[:, 0, :], n[:, 1, :]


def dihedral_cos(vertices: jnp.ndarray, faces: jnp.ndarray,
                 edge_faces: jnp.ndarray) -> jnp.ndarray:
    """Cosine of the angle between adjacent-face normals per edge
    (reference Scene.dihedral_angle, DiffRender.py:440-443)."""
    n1, n2 = edge_face_normals(vertices, faces, edge_faces)
    return dot3(n1, n2)


def corner_angles_and_normals(triangles: jnp.ndarray, face_valid: jnp.ndarray):
    """Per-corner interior angles [F,3] and unit face normals [F,3]
    (reference JIT_corner_angles, DiffRender.py:165-187). Padded/degenerate
    faces produce zeros, not NaN."""
    u = triangles[..., 1, :] - triangles[..., 0, :]
    v = triangles[..., 2, :] - triangles[..., 0, :]
    w = triangles[..., 2, :] - triangles[..., 1, :]

    face_n = jnp.cross(u, v)
    face_n = safe_normalize(face_n)

    un = safe_normalize(u)
    vn = safe_normalize(v)
    wn = safe_normalize(w)

    a0 = jnp.arccos(jnp.clip(dot3(un, vn), -1.0, 1.0))
    a1 = jnp.arccos(jnp.clip(dot3(-un, wn), -1.0, 1.0))
    a2 = jnp.pi - a0 - a1
    angles = jnp.stack([a0, a1, a2], axis=-1)          # [F,3]

    valid = face_valid[..., None]
    return jnp.where(valid, angles, 0.0), jnp.where(valid, face_n, 0.0)
