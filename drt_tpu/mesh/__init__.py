from drt_tpu.mesh.ply import load_ply, save_ply  # noqa: F401
from drt_tpu.mesh.topology import MeshTopology, build_topology  # noqa: F401
from drt_tpu.mesh.state import MeshState, build_mesh_state  # noqa: F401
