from drt_tpu.remesh.isotropic import isotropic_remesh  # noqa: F401
from drt_tpu.remesh.hausdorff import hausdorff_distance, point_mesh_distance  # noqa: F401
from drt_tpu.remesh.surface import SurfaceIndex  # noqa: F401
