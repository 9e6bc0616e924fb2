from gcn_tpu.parallel.halo import HaloPlan, build_halo_plan, dist_spmm_halo
from gcn_tpu.parallel.mesh import create_mesh, create_mesh_2d
from gcn_tpu.parallel.partition import (ShardedGraph,
                                        band_degree_sort_order,
                                        shard_graph_by_rows)
from gcn_tpu.parallel.train_step import make_sharded_gcn_train_step

__all__ = [
    "HaloPlan",
    "band_degree_sort_order",
    "build_halo_plan",
    "create_mesh",
    "create_mesh_2d",
    "dist_spmm_halo",
    "ShardedGraph",
    "shard_graph_by_rows",
    "make_sharded_gcn_train_step",
]
