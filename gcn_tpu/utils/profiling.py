"""Profiling hooks: jax.profiler traces + file logging.

Complements the dmk-style named timers (gcn_tpu.utils.timers) with device
trace capture — the TPU-era counterpart of the reference's CUDA-event
instrumentation (pygcn/perf/dmk.py:71-117) when the timing question needs
op-level detail rather than phase totals. Also the logging setup matching
the reference drivers (profiling_gcn.py:18 logs to ``profiling-gcn.log``).
"""

from __future__ import annotations

import contextlib
import logging
import os


@contextlib.contextmanager
def device_trace(log_dir: str = "/tmp/gcn_tpu_trace"):
    """Capture a jax.profiler trace (view with TensorBoard / Perfetto).

    Usage:
        with device_trace("/tmp/trace"):
            train_step(...)
            jax.block_until_ready(loss)
    """
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def setup_logging(path: str = "profiling-gcn.log",
                  level: int = logging.INFO) -> logging.Logger:
    """File + console logging like the reference driver
    (profiling_gcn.py:18)."""
    logger = logging.getLogger("gcn_tpu")
    logger.setLevel(level)
    if not logger.handlers:
        fh = logging.FileHandler(path)
        fh.setFormatter(logging.Formatter(
            "%(asctime)s %(levelname)s %(message)s"))
        logger.addHandler(fh)
        sh = logging.StreamHandler()
        sh.setLevel(logging.WARNING)
        logger.addHandler(sh)
    return logger
