"""Space carving: build a visual-hull mesh from silhouette masks.

The reference never builds its hulls in-repo — the bundled `*_vh.ply` meshes
were carved upstream from the SAME masks that ship in the .h5 captures
(captured_data.py:12-20 loads those masks for both the silhouette loss and,
upstream, the hull). Round 1 rendered synthetic captures from the scan
meshes but initialized from the *upstream* hulls, which are inconsistent
with the synthetic masks (BASELINE.md round-1 analysis: the hand's wrist
region dominates the error). This module closes that gap: carve the hull
directly from the capture's own masks, exactly the consistency the real
pipeline has.

Pipeline: voxel occupancy = min over views of the soft mask sampled at each
voxel's projection -> morphological cleanup -> surface-nets isosurface
extraction (watertight by construction on well-composed fields) ->
isotropic remesh to the LOD start edge length.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from drt_tpu.data.views import CaptureData


def carve_occupancy(masks: np.ndarray, R: np.ndarray, K: np.ndarray,
                    lo: np.ndarray, hi: np.ndarray,
                    resolution: int = 128) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Min-over-views soft occupancy on a regular grid.

    masks: [Vw, resy, resx] soft masks in [0,1]; R: [Vw,4,4] world->cam;
    K: [Vw,3,3]. Returns (field [n,n,n], in_frame [n,n,n] bool, origin [3],
    spacing [3]).

    A voxel projecting outside a view's frame is unconstrained by that view
    (its mask says nothing there), so it does not carve — but `in_frame`
    records whether the voxel is inside EVERY view's frame. The rig keeps
    the object in frame in all views (true of the reference's ring rig and
    of the synthetic one), so the object satisfies in_frame everywhere and
    callers should reject never-observed voxels: at wide aspect ratios
    (Redmi 16:9) the volume corners above/below every frustum form solid
    slabs bigger than the object, and the largest-connected-component
    cleanup would otherwise keep a slab instead of the object (the pig
    round-2 failure).
    """
    lo = np.asarray(lo, np.float64)
    hi = np.asarray(hi, np.float64)
    n = resolution
    spacing = (hi - lo) / (n - 1)
    axes = [np.linspace(lo[a], hi[a], n) for a in range(3)]
    gx, gy, gz = np.meshgrid(*axes, indexing="ij")
    pts = jnp.asarray(np.stack([gx, gy, gz], axis=-1).reshape(-1, 3),
                      jnp.float32)                              # [P,3]

    resy, resx = masks.shape[1], masks.shape[2]

    @jax.jit
    def one_view(field, seen, mask, Rv, Kv):
        ones = jnp.ones((pts.shape[0], 1), jnp.float32)
        # full-precision projection (bf16 MXU default is off by pixels at
        # these magnitudes — see render/camera.py)
        hi = jax.lax.Precision.HIGHEST
        cam = jnp.matmul(jnp.concatenate([pts, ones], axis=1), Rv.T,
                         precision=hi)                          # [P,4]
        pix = jnp.matmul(cam[:, :3], Kv.T, precision=hi)
        z = pix[:, 2]
        x = pix[:, 0] / jnp.where(jnp.abs(z) > 1e-9, z, 1e-9)
        y = pix[:, 1] / jnp.where(jnp.abs(z) > 1e-9, z, 1e-9)
        inside = (z > 0) & (x >= 0) & (x <= resx - 1) & (y >= 0) \
            & (y <= resy - 1)
        x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, resx - 2)
        y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, resy - 2)
        wx = jnp.clip(x - x0, 0.0, 1.0)
        wy = jnp.clip(y - y0, 0.0, 1.0)
        m = ((1 - wy) * ((1 - wx) * mask[y0, x0] + wx * mask[y0, x0 + 1])
             + wy * ((1 - wx) * mask[y0 + 1, x0] + wx * mask[y0 + 1, x0 + 1]))
        view_occ = jnp.where(inside, m, 1.0)    # out of frame: unconstrained
        return jnp.minimum(field, view_occ), seen & inside

    field = jnp.ones((pts.shape[0],), jnp.float32)
    seen = jnp.ones((pts.shape[0],), jnp.bool_)
    for v in range(masks.shape[0]):
        field, seen = one_view(field, seen,
                               jnp.asarray(masks[v], jnp.float32),
                               jnp.asarray(R[v], jnp.float32),
                               jnp.asarray(K[v], jnp.float32))
    return (np.asarray(field).reshape(n, n, n),
            np.asarray(seen).reshape(n, n, n), lo, spacing)


# Cell-corner offsets (x,y,z) indexed 0..7, and the 12 cell edges as corner
# index pairs — the standard dual-grid configuration for surface nets.
_CORNERS = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0],
                     [0, 0, 1], [1, 0, 1], [0, 1, 1], [1, 1, 1]])
_CELL_EDGES = np.array([[0, 1], [2, 3], [4, 5], [6, 7],    # x-edges
                        [0, 2], [1, 3], [4, 6], [5, 7],    # y-edges
                        [0, 4], [1, 5], [2, 6], [3, 7]])   # z-edges


def surface_nets(field: np.ndarray, origin: np.ndarray, spacing: np.ndarray,
                 iso: float = 0.5):
    """Naive surface nets: one vertex per sign-changing cell (at the mean of
    its edge-crossing points), one quad per sign-changing grid edge,
    connecting the 4 cells around that edge. Returns (vertices [V,3] f64,
    faces [F,3] i64), consistently outward-oriented.
    """
    f = np.pad(field.astype(np.float64), 1, constant_values=iso - 1.0)
    occ = f > iso
    n = np.array(f.shape)

    # 8 corner samples per cell, shape [cx,cy,cz]
    corner_f = [f[dx:n[0] - 1 + dx, dy:n[1] - 1 + dy, dz:n[2] - 1 + dz]
                for dx, dy, dz in _CORNERS]
    corner_occ = [c > iso for c in corner_f]
    code = np.zeros(corner_f[0].shape, dtype=np.uint8)
    for i, c in enumerate(corner_occ):
        code |= (c.astype(np.uint8) << i)
    active = (code != 0) & (code != 255)
    if not active.any():
        raise ValueError("empty occupancy field — nothing to extract")

    cell_index = np.full(active.shape, -1, dtype=np.int64)
    ids = np.nonzero(active)
    cell_index[ids] = np.arange(len(ids[0]))

    # Vertex = mean of edge-crossing points over the cell's crossing edges.
    pos_sum = np.zeros((len(ids[0]), 3))
    cnt = np.zeros(len(ids[0]))
    cf = [c[ids] for c in corner_f]                     # per-active-cell
    for a, b in _CELL_EDGES:
        fa, fb = cf[a], cf[b]
        cross = (fa > iso) != (fb > iso)
        t = np.zeros_like(fa)
        denom = fb - fa
        t[cross] = (iso - fa[cross]) / denom[cross]
        p = _CORNERS[a] + t[:, None] * (_CORNERS[b] - _CORNERS[a])
        pos_sum += np.where(cross[:, None], p, 0.0)
        cnt += cross
    local = pos_sum / np.maximum(cnt, 1)[:, None]
    base = np.stack(ids, axis=1).astype(np.float64)     # cell lower corner
    # cells live on the padded grid: sample (i,j,k) = world origin + (i-1)*h
    verts = origin[None, :] + (base + local - 1.0) * spacing[None, :]

    # One quad per interior sign-changing sample edge along each axis.
    faces = []
    for axis in range(3):
        sl_lo = [slice(0, n[i] - (1 if i == axis else 0)) for i in range(3)]
        sl_hi = [slice(1 if i == axis else 0, n[i]) for i in range(3)]
        lo_occ = occ[tuple(sl_lo)]
        hi_occ = occ[tuple(sl_hi)]
        cross = lo_occ != hi_occ
        ei, ej, ek = np.nonzero(cross)
        e = np.stack([ei, ej, ek], axis=1)               # sample coords
        # 4 adjacent cells, counter-clockwise around the +axis direction
        u, w = (axis + 1) % 3, (axis + 2) % 3
        off = np.zeros((4, 3), dtype=np.int64)
        off[1][u] = -1
        off[2][u] = -1
        off[2][w] = -1
        off[3][w] = -1
        quad = np.stack([cell_index[tuple((e + o).T)] for o in off], axis=1)
        ok = (quad >= 0).all(axis=1)
        quad = quad[ok]
        # orientation: if the low sample is solid the normal points +axis
        flip = lo_occ[ei[ok], ej[ok], ek[ok]]
        quad[flip] = quad[flip][:, ::-1]
        faces.append(np.stack([quad[:, 0], quad[:, 1], quad[:, 2]], axis=1))
        faces.append(np.stack([quad[:, 0], quad[:, 2], quad[:, 3]], axis=1))
    faces = np.concatenate(faces).astype(np.int64)

    # Consistent global orientation -> make it outward via signed volume.
    tri = verts[faces]
    vol = np.einsum("ij,ij->", np.cross(tri[:, 0], tri[:, 1]), tri[:, 2]) / 6
    if vol < 0:
        faces = faces[:, ::-1]
    return verts, faces


def _cleanup_binary(occ: np.ndarray) -> np.ndarray:
    """Largest connected component + hole fill — removes speckle that would
    break manifoldness."""
    from scipy import ndimage
    occ = ndimage.binary_fill_holes(occ)
    labels, num = ndimage.label(occ)
    if num > 1:
        sizes = ndimage.sum(occ, labels, range(1, num + 1))
        occ = labels == (1 + int(np.argmax(sizes)))
    return occ


def _make_well_composed(occ: np.ndarray, max_rounds: int = 64) -> np.ndarray:
    """Repair the binary field until it is well-composed (no 2D checkerboard
    plaquettes, no solid voxel pairs touching only at a cube corner) — the
    condition under which surface nets yields a 2-manifold watertight
    surface. Repairs only ever ADD solid voxels, so the hull property
    (carved volume contains the object) is preserved.
    """
    occ = occ.copy()
    for _ in range(max_rounds):
        changed = False
        # 2D checkerboards in each axis-aligned plane: two solid voxels
        # sharing only an edge -> fill the two empty diagonal cells.
        for a, b in ((0, 1), (0, 2), (1, 2)):
            def sl(da, db):
                s = [slice(None)] * 3
                s[a] = slice(da, occ.shape[a] - 1 + da)
                s[b] = slice(db, occ.shape[b] - 1 + db)
                return tuple(s)
            s00, s01 = occ[sl(0, 0)], occ[sl(0, 1)]
            s10, s11 = occ[sl(1, 0)], occ[sl(1, 1)]
            cb1 = s00 & s11 & ~s01 & ~s10
            cb2 = ~s00 & ~s11 & s01 & s10
            if cb1.any():
                s01[cb1] = True
                s10[cb1] = True
                changed = True
            if cb2.any():
                s00[cb2] = True
                s11[cb2] = True
                changed = True
        # 3D corner contacts: exactly two solid voxels in a 2x2x2 block,
        # diagonally opposite -> fill a face-neighbor of one of them.
        n0, n1, n2 = occ.shape
        blk = [occ[dx:n0 - 1 + dx, dy:n1 - 1 + dy, dz:n2 - 1 + dz]
               for dx, dy, dz in _CORNERS]
        total = sum(x.astype(np.int8) for x in blk)
        for i, j in ((0, 7), (1, 6), (2, 5), (3, 4)):
            pair = blk[i] & blk[j] & (total == 2)
            if pair.any():
                # corner i offset (x,y,z); fill the voxel differing in x only
                fill = _CORNERS[i].copy()
                fill[0] ^= 1
                blk[int(fill[0]) + 2 * int(fill[1]) + 4 * int(fill[2])][pair] = True
                changed = True
        if not changed:
            return occ
    raise ValueError("well-composed repair did not converge")


def rig_working_volume(cap: CaptureData, frac: float = 0.45):
    """Carving volume (lo, hi) from the camera geometry alone — no ground
    truth needed (real .h5 captures have none). Center = least-squares
    intersection of the optical axes (the rig's turntable center); half
    extent = `frac` x mean camera distance. The ring rig frames the object
    at roughly cam_dist/3.5 radius (captured_data.py geometry), so 0.45
    over-covers safely: oversizing is harmless since carved_visual_hull
    rejects never-in-frame voxels and carves the rest.
    """
    R = np.asarray(cap.views.R, np.float64)            # [Vw,4,4] world->cam
    R_inv = np.linalg.inv(R)
    centers = R_inv[:, :3, 3]                          # camera positions
    axes = R[:, 2, :3]                                 # viewing directions
    axes = axes / np.linalg.norm(axes, axis=1, keepdims=True)
    # min_p sum ||(I - z z^T)(p - o)||^2  ->  A p = b
    eye = np.eye(3)
    proj = eye[None] - axes[:, :, None] * axes[:, None, :]
    A = proj.sum(0)
    b = np.einsum("vij,vj->i", proj, centers)
    p = np.linalg.solve(A, b)
    half = frac * float(np.linalg.norm(centers - p, axis=1).mean())
    return p - half, p + half


def carved_visual_hull(cap: CaptureData, lo, hi, resolution: int = 128,
                       target_len: float | None = None):
    """Carve a hull from the capture's own masks (self-consistent init).

    lo/hi: world-space bounds of the carving volume (the rig's calibrated
    working volume). Returns (vertices, faces), optionally remeshed to
    `target_len`. Raises if the extracted surface is not watertight even
    after morphological cleanup.
    """
    from drt_tpu.mesh.topology import build_topology

    masks = np.asarray(cap.views.mask)
    R = np.asarray(cap.views.R)
    K = np.asarray(cap.views.K)
    field, seen, origin, spacing = carve_occupancy(masks, R, K, lo, hi,
                                                   resolution)

    # Reject voxels not observed by every view: the object is in frame in
    # all views, so this only removes the never-carvable out-of-frustum
    # regions (which can exceed the object in volume at wide aspects).
    field = np.where(seen, field, 0.0)
    occ = _cleanup_binary(field > 0.5)
    occ = _make_well_composed(occ)
    # keep the soft field where it survived cleanup (smooth crossings),
    # hard 0/1 where repair changed the sign
    field = np.where(occ == (field > 0.5), field, occ.astype(field.dtype))
    v, f = surface_nets(field, origin, spacing)

    topo = build_topology(f, len(v))
    if not topo.is_watertight:
        from scipy import ndimage
        occ2 = ndimage.binary_closing(occ, iterations=1)
        occ2 = _make_well_composed(_cleanup_binary(occ2))
        v, f = surface_nets(occ2.astype(np.float64), origin, spacing)
        topo = build_topology(f, len(v))
        if not topo.is_watertight:
            raise ValueError("carved surface is not watertight")

    if target_len is not None:
        from drt_tpu.remesh import isotropic_remesh
        v, f = isotropic_remesh(v, f, target_len)
    return v, f
