from gcn_tpu.train.metrics import accuracy, masked_nll
from gcn_tpu.train.optim import adam_l2
from gcn_tpu.train.loop import TrainResult, fit_gcn

__all__ = ["accuracy", "masked_nll", "adam_l2", "TrainResult", "fit_gcn"]
