from gcn_tpu.tile.format import PanelAdj
from gcn_tpu.tile.tiler import panel_adjacency

__all__ = ["PanelAdj", "panel_adjacency"]
