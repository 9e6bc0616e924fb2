"""Aux subsystem tests: YAML config tags, checkpointing, CSV dumps,
row-CDF analysis — the reference's observability/config surface
(SURVEY.md §5)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gcn_tpu.analysis import plot_row_cdfs, row_cdf
from gcn_tpu.graph.csr import coo_to_csr
from gcn_tpu.utils.checkpoint import load_params, save_params, snapshot
from gcn_tpu.utils.config import get_config
from gcn_tpu.utils.writecsv import read as csv_read
from gcn_tpu.utils.writecsv import write as csv_write


def _graph(rng, n=40, m=200):
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    return coo_to_csr(src, dst, rng.random(m).astype(np.float32), (n, n))


def test_config_join_concat_tags(tmp_path):
    cfg_file = tmp_path / "c.yaml"
    cfg_file.write_text(
        "root: &r {}\n"
        "kind: &k hyper\n"
        "name: &n Foo\n"
        "sub: !join [*r, !concat [*k, _, *n]]\n"
        "result_root: !join [*r, out]\n"
        "ckpt_folder: !join [*r, out, ckpt]\n".format(tmp_path))
    cfg = get_config(str(cfg_file))
    assert cfg["sub"] == os.path.join(str(tmp_path), "hyper_Foo")
    assert os.path.isdir(cfg["result_root"])
    assert os.path.isdir(cfg["ckpt_folder"])


def test_default_hgnn_config_parses(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)  # result dirs created relative to cwd
    import gcn_tpu

    path = os.path.join(os.path.dirname(gcn_tpu.__file__), "configs",
                        "hgnn.yaml")
    cfg = get_config(path)
    assert cfg["n_hid"] == 128 and cfg["max_epoch"] == 600
    assert cfg["K_neigs"] == [10]
    assert cfg["result_sub_folder"].endswith("hypergraph_NTU2012")


def test_checkpoint_roundtrip(tmp_path, rng):
    params = {
        "gc1": {"w": jnp.asarray(rng.standard_normal((8, 4)),
                                 dtype=jnp.float32),
                "b": jnp.zeros((4,))},
        "gc2": {"w": jnp.asarray(rng.standard_normal((4, 3)),
                                 dtype=jnp.float32)},
    }
    path = str(tmp_path / "ckpt.npz")
    save_params(path, params)
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    restored = load_params(path, zeros)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_suffixless_path_roundtrip(tmp_path):
    """save('model.ckpt') / load('model.ckpt') must agree even though
    np.savez appends '.npz' (both sides normalize the suffix)."""
    params = {"w": jnp.ones((3, 2))}
    path = str(tmp_path / "model.ckpt")
    save_params(path, params)
    restored = load_params(path, {"w": jnp.zeros((3, 2))})
    np.testing.assert_array_equal(np.asarray(restored["w"]),
                                  np.ones((3, 2)))


def test_checkpoint_shape_mismatch(tmp_path):
    save_params(str(tmp_path / "c.npz"), {"w": jnp.zeros((3, 3))})
    with pytest.raises(ValueError, match="shape mismatch"):
        load_params(str(tmp_path / "c.npz"), {"w": jnp.zeros((2, 2))})


def test_training_state_checkpoint_resume(tmp_path, rng):
    """Full train-state round trip (params + optax adam state + iter),
    and resumed training continues identically to uninterrupted."""
    import optax

    from gcn_tpu.train.optim import adam_l2
    from gcn_tpu.utils.checkpoint import (load_training_state,
                                          save_training_state)

    params = {"w": jnp.asarray(rng.standard_normal((6, 3)),
                               dtype=jnp.float32)}
    tx = adam_l2(0.05, 1e-4)
    opt = tx.init(params)
    grads = {"w": jnp.ones((6, 3)) * 0.1}

    def step(p, o):
        upd, o = tx.update(grads, o, p)
        return optax.apply_updates(p, upd), o

    # 3 uninterrupted steps = 1 step, checkpoint, restore, 2 more steps
    p_ref, o_ref = params, opt
    for _ in range(3):
        p_ref, o_ref = step(p_ref, o_ref)

    p1, o1 = step(params, opt)
    path = str(tmp_path / "state")
    save_training_state(path, p1, o1, 1)
    p2, o2, it, rng = load_training_state(path, params, tx.init(params))
    assert it == 1 and rng is None
    for _ in range(2):
        p2, o2 = step(p2, o2)
    np.testing.assert_allclose(np.asarray(p2["w"]), np.asarray(p_ref["w"]),
                               rtol=1e-6, atol=1e-7)


def test_snapshot_is_host_copy(rng):
    p = {"w": jnp.asarray(rng.standard_normal((4, 4)), dtype=jnp.float32)}
    s = snapshot(p)
    assert isinstance(s["w"], np.ndarray)
    np.testing.assert_array_equal(s["w"], np.asarray(p["w"]))


def test_writecsv_roundtrip(tmp_path, rng):
    g = _graph(rng)
    path = csv_write(g, "test_mat", str(tmp_path))
    g2 = csv_read(path)
    np.testing.assert_array_equal(g.indptr, g2.indptr)
    np.testing.assert_array_equal(g.indices, g2.indices)
    np.testing.assert_allclose(g.data, g2.data, rtol=1e-6)


def test_writecsv_append_mode(tmp_path, rng):
    g = _graph(rng)
    p1 = csv_write(g, "a", str(tmp_path), append=False)
    p2 = csv_write(g, "b", str(tmp_path), append=True)
    assert open(p1).read() == open(p2).read()


def test_row_cdf_and_plot(tmp_path, rng):
    g = _graph(rng)
    x, y = row_cdf(g)
    assert y[-1] == pytest.approx(1.0)
    assert (np.diff(y) >= 0).all()
    out = plot_row_cdfs({"g": g}, str(tmp_path / "row.svg"))
    assert os.path.exists(out) and os.path.getsize(out) > 0


def test_permute_rows_roundtrip(rng):
    import jax.numpy as jnp

    from gcn_tpu.ops import inverse_permutation, permute_rows, remap_indices

    n = 50
    x = jnp.asarray(rng.standard_normal((n, 7)).astype(np.float32))
    perm = rng.permutation(n).astype(np.int32)
    y = permute_rows(x, perm)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x)[perm])
    back = permute_rows(y, inverse_permutation(perm))
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))
    # labels[remap(idx)] after permuting labels == labels_orig[idx]
    labels = rng.integers(0, 5, n)
    labels_new = labels[perm]
    idx = rng.integers(0, n, 12)
    np.testing.assert_array_equal(
        labels_new[np.asarray(remap_indices(idx, perm))], labels[idx])


def test_row_analysis_cli(tmp_path):
    import subprocess
    import sys

    out = tmp_path / "row.svg"
    r = subprocess.run(
        [sys.executable, "examples/row_analysis.py", "-g", "synth-tiny",
         "-o", str(out)],
        capture_output=True, text=True, timeout=300,
        env={**os.environ, "JAX_PLATFORMS": "cpu",
             "PALLAS_AXON_POOL_IPS": ""},
    )
    assert r.returncode == 0, r.stderr
    assert out.exists()


def test_profiling_helpers(tmp_path):
    from gcn_tpu.utils.profiling import device_trace, setup_logging

    log = setup_logging(str(tmp_path / "t.log"))
    log.info("hello")
    for h in log.handlers:
        h.flush()
    assert "hello" in open(tmp_path / "t.log").read()
    import jax.numpy as jnp

    with device_trace(str(tmp_path / "trace")) as d:
        _ = jnp.ones((8, 8)).sum().block_until_ready()
    assert os.path.isdir(d)
