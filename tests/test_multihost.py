"""Multi-HOST validation: jax.distributed across real process boundaries.

The CPU stand-in for multi-host TPU (SURVEY.md §4e): two processes, each a
fake 4-device host, form one 8-device global mesh; the halo-exchange
training step runs SPMD across them. Losses must match the same problem
run single-process on an 8-device mesh.
"""

import json
import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _clean_env():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    return env


def test_two_process_training_matches_single_process():
    here = os.path.dirname(os.path.abspath(__file__))
    worker = os.path.join(here, "multihost_worker.py")
    coord = f"127.0.0.1:{_free_port()}"
    env = _clean_env()
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coord, "2", str(pid), "4"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env, cwd=os.path.dirname(here))
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed:\n{err[-3000:]}"
    m = re.search(r"LOSSES (\[.*\])", outs[0][1])
    assert m, f"no losses printed:\n{outs[0][1]}"
    losses_mp = json.loads(m.group(1))

    # single-process reference on an 8-device mesh (same seeds/problem)
    ref = subprocess.run(
        [sys.executable, worker, f"127.0.0.1:{_free_port()}", "1", "0", "8"],
        capture_output=True, text=True, timeout=420, env=env,
        cwd=os.path.dirname(here))
    assert ref.returncode == 0, ref.stderr[-3000:]
    losses_sp = json.loads(
        re.search(r"LOSSES (\[.*\])", ref.stdout).group(1))
    np.testing.assert_allclose(losses_mp, losses_sp, rtol=1e-4, atol=1e-5)
