from gcn_tpu.models.gcn import GCN
from gcn_tpu.models.gcn_core import gcn_forward, init_gcn_params

__all__ = ["GCN", "gcn_forward", "init_gcn_params"]
