from gcn_tpu.utils.checkpoint import load_params, save_params, snapshot
from gcn_tpu.utils.config import get_config
from gcn_tpu.utils.timers import Timer, Timers
from gcn_tpu.utils.writecsv import write as write_csv

__all__ = ["Timer", "Timers", "get_config", "load_params", "save_params",
           "snapshot", "write_csv"]
