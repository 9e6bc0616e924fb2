from gcn_tpu.data.registry import GraphData, get_dataset

__all__ = ["GraphData", "get_dataset"]
