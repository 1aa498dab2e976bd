from drt_tpu.geometry.vec import (  # noqa: F401
    dot3, reflect, refract, fresnel_dielectric, safe_normalize,
)
from drt_tpu.geometry.mt import moller_trumbore  # noqa: F401
from drt_tpu.geometry.metrics import (  # noqa: F401
    face_areas, area_var, edge_var, corner_angles_and_normals,
    edge_face_normals, dihedral_cos,
)
from drt_tpu.geometry.normals import vertex_normals  # noqa: F401
from drt_tpu.geometry.laplacian import uniform_laplacian_smooth  # noqa: F401
