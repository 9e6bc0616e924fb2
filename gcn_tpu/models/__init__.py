from gcn_tpu.models.gcn import GCN
from gcn_tpu.models.gcn_core import gcn_forward, init_gcn_params
from gcn_tpu.models.hgnn import HGNN, hgnn_forward, init_hgnn_params

__all__ = ["GCN", "HGNN", "gcn_forward", "hgnn_forward", "init_gcn_params",
           "init_hgnn_params"]
