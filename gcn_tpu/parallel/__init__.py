from gcn_tpu.parallel.halo import (HaloPlan, HierHaloPlan,
                                   RaggedHaloPlan, build_halo_plan,
                                   build_halo_plan_hier,
                                   build_halo_plan_ragged,
                                   dist_spmm_halo, make_halo_exchange)
from gcn_tpu.parallel.mesh import (create_mesh, create_mesh_2d,
                                   create_mesh_hier,
                                   create_mesh_hier_model)
from gcn_tpu.parallel.partition import (ShardedGraph,
                                        band_degree_sort_order,
                                        shard_graph_by_rows)
from gcn_tpu.parallel.train_step import (make_sharded_gcn_train_step,
                                         pad_model_params)

__all__ = [
    "HaloPlan",
    "HierHaloPlan",
    "RaggedHaloPlan",
    "band_degree_sort_order",
    "build_halo_plan",
    "build_halo_plan_hier",
    "build_halo_plan_ragged",
    "create_mesh",
    "create_mesh_2d",
    "create_mesh_hier",
    "create_mesh_hier_model",
    "dist_spmm_halo",
    "make_halo_exchange",
    "ShardedGraph",
    "shard_graph_by_rows",
    "make_sharded_gcn_train_step",
    "pad_model_params",
]
