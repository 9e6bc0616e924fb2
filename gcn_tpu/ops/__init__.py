from gcn_tpu.ops.adjacency import CooAdj, DenseAdj, device_adjacency
from gcn_tpu.ops.permute import (inverse_permutation, permute_rows,
                                 remap_indices)
from gcn_tpu.ops.spmm import spmm

__all__ = ["CooAdj", "DenseAdj", "device_adjacency", "inverse_permutation",
           "permute_rows", "remap_indices", "spmm"]
