from gcn_tpu.graph.csr import CSRGraph, coo_to_csr, csr_to_coo
from gcn_tpu.graph.normalize import (
    gcn_normalize,
    row_normalize,
    row_normalize_features,
)

__all__ = [
    "CSRGraph",
    "coo_to_csr",
    "csr_to_coo",
    "gcn_normalize",
    "row_normalize",
    "row_normalize_features",
]
