"""Load the reference's OWN PyTorch code (/root/reference) on CPU.

VERDICT round-3 missing item 1 / next-item 2: parity must be proven against
the reference's own lines, not a paraphrase. The reference's math is pure
TorchScript-decorated Python; only two native dependencies block a CPU
import, and both are stubbed here WITHOUT modifying any reference code:

- `optix` (the OptiX Prime C++ extension, compiled at import time by
  `torch.utils.cpp_extension.load`, DiffRender.py:5-6): replaced by a stub
  whose `optix_mesh.intersect` delegates to drt_tpu's brute-force oracle
  (`intersect/brute.py`). Both pipelines therefore answer "which triangle
  does this ray hit" with the SAME code on the same float32-cast inputs —
  the oracle is non-differentiable in both (SURVEY.md §1), so this changes
  nothing about what the parity tests compare: the differentiable chains.
- `trimesh` (topology queries, DiffRender.py:304-370): a minimal
  implementation of exactly the attributes the reference reads
  (edges / edges_sorted / edges_face / vertex_neighbors / is_watertight /
  grouping.group_rows), built on numpy.

The modules are imported once per process and cached; module globals are
then pointed at CPU (the reference configures itself by mutating
`DiffRender.device/Float/resx/resy`, exactly as optim.py:178-182 does).
"""

from __future__ import annotations

import os
import sys
import types
from types import SimpleNamespace

import numpy as np

REFERENCE_DIR = "/root/reference"

_cache = None


# --------------------------------------------------------------------------
# fake trimesh: the topology queries Scene.update_mesh/init_edge/init_weightM
# rely on (DiffRender.py:304-370)
# --------------------------------------------------------------------------

def _group_rows(rows, require_count=2):
    """trimesh.grouping.group_rows(data, require_count): groups of row
    indices whose rows are identical, keeping only groups of exactly
    `require_count` (DiffRender.py:348 uses require_count=2 to find
    watertight edges)."""
    rows = np.asarray(rows)
    order = np.lexsort(rows.T[::-1])
    srt = rows[order]
    change = np.any(srt[1:] != srt[:-1], axis=1)
    starts = np.concatenate(([0], np.nonzero(change)[0] + 1, [len(rows)]))
    return np.array([order[a:b] for a, b in zip(starts[:-1], starts[1:])
                     if b - a == require_count])


class _FakeTrimesh:
    """The subset of trimesh.Trimesh the reference Scene reads."""

    def __init__(self, vertices, faces):
        self.vertices = np.asarray(vertices, dtype=np.float64)
        self.faces = np.asarray(faces, dtype=np.int64)
        F = len(self.faces)
        # trimesh's directed per-face edge list: (v0,v1),(v1,v2),(v2,v0)
        self.edges = self.faces[:, [0, 1, 1, 2, 2, 0]].reshape(-1, 2)
        self.edges_sorted = np.sort(self.edges, axis=1)
        self.edges_face = np.repeat(np.arange(F), 3)
        uniq, counts = np.unique(self.edges_sorted, axis=0,
                                 return_counts=True)
        self.is_watertight = bool((counts == 2).all())
        nbrs = [[] for _ in range(len(self.vertices))]
        for a, b in uniq:
            nbrs[int(a)].append(int(b))
            nbrs[int(b)].append(int(a))
        self.vertex_neighbors = nbrs

    def export(self, path):
        from drt_tpu.mesh.ply import save_ply
        save_ply(path, self.vertices, self.faces)


def _build_fake_trimesh_module():
    mod = types.ModuleType("trimesh")
    grouping = types.ModuleType("trimesh.grouping")
    grouping.group_rows = _group_rows

    def load(path, process=False):
        from drt_tpu.mesh.ply import load_ply
        v, f = load_ply(str(path))
        return _FakeTrimesh(v, f)

    mod.load = load
    mod.Trimesh = _FakeTrimesh
    mod.grouping = grouping
    sys.modules["trimesh"] = mod
    sys.modules["trimesh.grouping"] = grouping
    return mod


# --------------------------------------------------------------------------
# stub optix module: same public surface as optix_extend.cpp:77-83, hit
# answers from drt_tpu's brute oracle
# --------------------------------------------------------------------------

def _build_stub_optix():
    import torch

    mod = types.ModuleType("optix")

    class optix_mesh:
        def __init__(self, cuda_device=0):
            self._V = None
            self._F = None

        def update_mesh(self, F, V):
            # optix_extend.cpp:14-27: int32 faces + f32 verts, full rebuild
            self._F = F.detach().cpu().numpy().astype(np.int32)
            self.update_vert(V)

        def update_vert(self, V):
            # optix_extend.cpp:61-67: vertex-only refit
            self._V = V.detach().cpu().numpy().astype(np.float32)

        def intersect(self, rays):
            """rays [n,6] f32 -> (T [n] f32, triId [n]). Miss <=> T <= 0
            (DiffRender.py:391). Answered by drt_tpu's brute oracle so both
            pipelines share one hit-finding code path."""
            import jax.numpy as jnp
            from drt_tpu.intersect.brute import intersect_brute

            r = rays.detach().cpu().numpy()
            hits = intersect_brute(
                jnp.asarray(r[:, :3]), jnp.asarray(r[:, 3:]),
                jnp.asarray(self._V), jnp.asarray(self._F))
            t = np.asarray(hits.t)
            tri = np.asarray(hits.tri_id)
            T = np.where(tri >= 0, t, -1.0).astype(np.float32)
            return torch.from_numpy(T), torch.from_numpy(
                tri.astype(np.int64))

    mod.optix_mesh = optix_mesh
    return mod


# --------------------------------------------------------------------------
# loader
# --------------------------------------------------------------------------

def load_reference():
    """Import DiffRender/optim/captured_data/config from /root/reference
    with optix+trimesh stubbed. Returns a namespace with the modules,
    configured for CPU float64 (the reference's autograd regime,
    DiffRender.py:19)."""
    global _cache
    if _cache is not None:
        return _cache

    import torch
    import torch.utils.cpp_extension as cppext

    stub = _build_stub_optix()
    _build_fake_trimesh_module()

    orig_load = cppext.load
    cppext.load = lambda *a, **k: stub
    sys.path.insert(0, REFERENCE_DIR)
    cwd = os.getcwd()
    try:
        os.chdir(REFERENCE_DIR)   # DiffRender passes a relative source path
        import DiffRender
        import captured_data
        import config as ref_config
        import optim
    finally:
        os.chdir(cwd)
        cppext.load = orig_load
        sys.path.remove(REFERENCE_DIR)

    DiffRender.device = "cpu"
    DiffRender.Float = torch.float64
    captured_data.device = "cpu"
    optim.device = "cpu"
    optim.Float = torch.float64

    _cache = SimpleNamespace(DiffRender=DiffRender, optim=optim,
                             captured_data=captured_data, config=ref_config,
                             torch=torch)
    return _cache


# --------------------------------------------------------------------------
# FakeData: the Data interface Loss_calculator consumes
# (captured_data.py:44-82) backed by in-memory synthetic views
# --------------------------------------------------------------------------

class FakeData:
    """views: list of dicts with torch tensors screen_pixel [N,3], valid [N]
    bool, mask [N], origin [N,3], ray_dir [N,3], camera_M tuple."""

    def __init__(self, views, resy, resx):
        self.views = views
        self.resy = resy
        self.resx = resx

    def get_view(self, i):
        v = self.views[i]
        return (v["screen_pixel"], v["valid"], v["mask"], v["origin"],
                v["ray_dir"], v["camera_M"])

    def ray_view_generator(self):
        while True:
            yield 0

    def silh_view_generator(self):
        while True:
            yield from range(len(self.views))
