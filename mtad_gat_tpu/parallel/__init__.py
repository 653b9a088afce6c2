from mtad_gat_tpu.parallel import multihost
from mtad_gat_tpu.parallel.banded_halo import banded_halo_attention
from mtad_gat_tpu.parallel.mesh import make_mesh, best_mesh_shape
from mtad_gat_tpu.parallel.sharding import use_mesh, current_mesh, constrain

__all__ = [
    "make_mesh", "best_mesh_shape", "use_mesh", "current_mesh", "constrain",
    "multihost", "banded_halo_attention",
]
