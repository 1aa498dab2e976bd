"""drt_tpu — a TPU-native differentiable refraction-tracing framework.

A from-scratch reimplementation of the capabilities of DRT ("Differentiable
Refraction-Tracing for Mesh Reconstruction of Transparent Objects", SIGGRAPH
Asia 2020; reference implementation lvjiahui/DRT) designed for TPU hardware:

- jax/XLA for all differentiable compute (float32 with numerical stabilizers
  instead of the reference's float64 autograd),
- static shapes + lane masking instead of dynamic ray compaction
  (reference: DiffRender.py:279-283 `Ray.select`),
- a Pallas ray-casting kernel instead of the OptiX Prime C++ extension
  (reference: optix_extend.cpp),
- an in-process isotropic remesher instead of a meshlabserver subprocess
  (reference: optim.py:12-56),
- multi-chip scaling via jax.sharding over a ray axis (the reference is
  single-GPU only).

Layer map (mirrors SURVEY.md §7):
    geometry/   pure differentiable math kernels
    mesh/       PLY IO, topology extraction, padded device mesh state
    intersect/  the non-differentiable hit oracle (brute / culled / pallas)
    render/     2-bounce refraction trace, silhouette edge sampling, cameras
    data/       captured-h5 loader and synthetic capture generator
    optimize/   losses, LOD schedules, the pass/iter optimization loop
    remesh/     isotropic explicit remeshing + Hausdorff evaluation
    parallel/   device-mesh sharding of the ray batch
"""

__version__ = "0.1.0"

from drt_tpu.config import HyperParams  # noqa: F401
