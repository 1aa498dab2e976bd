from drt_tpu.render.trace import (  # noqa: F401
    refract_ray, trace2, render_transparent, render_mask, TraceResult,
)
from drt_tpu.render.camera import CameraM, generate_rays, project_vertices  # noqa: F401
from drt_tpu.render.silhouette import (  # noqa: F401
    silhouette_edge_mask, primary_visibility,
)
