"""Angle-weighted vertex normals via segment_sum.

The reference builds a (V x F) sparse corner-angle matrix and multiplies it by
the face normals (`Scene.init_VN`, DiffRender.py:319-336). On TPU the sparse
matmul becomes a `segment_sum` scatter over the 3F corner contributions —
the idiomatic XLA formulation of the same angle-weighted average.
Weights (corner angles) are stop-gradient'ed, matching the reference's
`.detach()` on the weight (DiffRender.py:332); the face normals remain
differentiable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from drt_tpu.geometry.metrics import corner_angles_and_normals
from drt_tpu.geometry.vec import safe_normalize


def vertex_normals(vertices: jnp.ndarray, faces: jnp.ndarray,
                   face_valid: jnp.ndarray) -> jnp.ndarray:
    """[Vp,3] angle-weighted unit vertex normals."""
    triangles = vertices[faces]                            # [Fp,3,3]
    angles, face_n = corner_angles_and_normals(triangles, face_valid)
    weights = jax.lax.stop_gradient(angles)                # [Fp,3]

    # 3F corner contributions: weight[f,c] * face_n[f] accumulated at
    # vertex faces[f,c].
    contrib = weights[..., None] * face_n[:, None, :]      # [Fp,3,3]
    seg = jax.ops.segment_sum(
        contrib.reshape(-1, 3),
        faces.reshape(-1),
        num_segments=vertices.shape[0],
    )
    return safe_normalize(seg)
