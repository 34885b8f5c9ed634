from .mesh import make_mesh, default_mesh_shape
from .distributed import initialize, is_multiprocess
from .sharding import (
    batch_spec,
    batch_sharding,
    param_specs,
    param_sharding,
    replicated_sharding,
)
from .halo import (partition_graph, partition_graph_ring,
                   gkn_apply_node_sharded,
                   gkn_apply_node_sharded_ring)
from .halo_mgkn import (partition_multilevel_graph,
                        mgkn_general_apply_node_sharded,
                        partition_multipole1d,
                        mgkn_orthogonal_apply_node_sharded)

__all__ = [
    "make_mesh", "default_mesh_shape", "initialize", "is_multiprocess",
    "batch_spec", "batch_sharding", "param_specs", "param_sharding",
    "replicated_sharding",
    "partition_graph", "partition_graph_ring",
    "gkn_apply_node_sharded", "gkn_apply_node_sharded_ring",
    "partition_multilevel_graph", "mgkn_general_apply_node_sharded",
    "partition_multipole1d", "mgkn_orthogonal_apply_node_sharded",
]
