"""Smoke tests for the CLI drivers (examples/).

The drivers are the reference-parity surface (profiling_gcn.py analogue
plus the beyond-reference distributed CLI); these guard that both run
end-to-end from a clean process — argument wiring, dataset registry,
training, and the final accuracy printout — on the 8-fake-device CPU
mesh. Kept tiny (synth-tiny, 5 iters) so the suite cost is compile-bound.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(
    os.environ,
    PALLAS_AXON_POOL_IPS="",
    JAX_PLATFORMS="cpu",
    XLA_FLAGS="--xla_force_host_platform_device_count=8",
)


def _run(args, timeout=480):
    return subprocess.run(
        [sys.executable] + args, env=ENV, cwd=REPO,
        capture_output=True, text=True, timeout=timeout)


def test_train_gcn_cli_smoke():
    r = _run(["examples/train_gcn.py", "-g", "synth-tiny", "-k", "8",
              "-i", "5", "--variant", "v4"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Test set results" in r.stdout


def test_bench_e2e_width_smoke(tmp_path):
    out = str(tmp_path / "e2e.json")
    r = _run(["examples/bench_e2e_width.py", "-g", "synth-tiny",
              "-i", "5", "--variants", "v4", "--hiddens", "8",
              "-o", out])
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(out)
    assert "warm step ms" in r.stdout


def test_train_gcn_dist_cli_smoke():
    r = _run(["examples/train_gcn_dist.py", "-g", "synth-tiny", "-k", "8",
              "-i", "5", "--dropout", "0.0"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Test set results" in r.stdout
    assert "exchange fraction" in r.stdout


def test_train_gcn_dist_resume_matches_uninterrupted(tmp_path):
    """6 iters straight == 3 iters + save + resume 3 more: the sharded
    CLI's fold_in(seed, i) rng stream and npz state make distributed
    training exactly resumable (the single-chip driver's guarantee,
    extended to the mesh path)."""
    st = str(tmp_path / "dist_state")
    full = _run(["examples/train_gcn_dist.py", "-g", "synth-tiny",
                 "-k", "8", "-i", "6", "--dropout", "0.5"])
    assert full.returncode == 0, full.stderr[-2000:]
    a = _run(["examples/train_gcn_dist.py", "-g", "synth-tiny", "-k", "8",
              "-i", "3", "--dropout", "0.5", "--save-state", st])
    assert a.returncode == 0, a.stderr[-2000:]
    b = _run(["examples/train_gcn_dist.py", "-g", "synth-tiny", "-k", "8",
              "-i", "3", "--dropout", "0.5", "--resume-state", st])
    assert b.returncode == 0, b.stderr[-2000:]
    assert "resumed from" in b.stdout

    def final_loss(out):
        line = [l for l in out.splitlines() if "final loss" in l][-1]
        return float(line.rsplit("final loss", 1)[1].strip(" )"))

    assert abs(final_loss(full.stdout) - final_loss(b.stdout)) < 1e-5
