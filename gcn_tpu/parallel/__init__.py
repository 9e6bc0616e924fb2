from gcn_tpu.parallel.mesh import create_mesh
from gcn_tpu.parallel.partition import ShardedGraph, shard_graph_by_rows
from gcn_tpu.parallel.train_step import make_sharded_gcn_train_step

__all__ = [
    "create_mesh",
    "ShardedGraph",
    "shard_graph_by_rows",
    "make_sharded_gcn_train_step",
]
