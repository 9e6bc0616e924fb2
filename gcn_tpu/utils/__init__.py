from gcn_tpu.utils.timers import Timer, Timers

__all__ = ["Timer", "Timers"]
