"""Real-data loader tests against synthetic fixture files.

The loaders parse the exact on-disk formats the reference consumes
(gnn-meta-attack npz — dataio.py:127-150; Planetoid pickles —
dataio.py:68-102; GraphSAINT directories — profiling_gcn.py:22-72;
HGNN .mat — data_helper.py:5-22). Fixtures are tiny synthetic files in
those formats.
"""

import json
import os
import pickle

import numpy as np
import pytest
import scipy.sparse as sp

from gcn_tpu.data import get_dataset
from gcn_tpu.data.graphsaint import load as load_graphsaint
from gcn_tpu.data.planetoid import load as load_planetoid


def _random_sym_adj(rng, n, m):
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    a = sp.coo_matrix((np.ones(keep.sum(), np.float32),
                       (src[keep], dst[keep])), shape=(n, n)).tocsr()
    a = a + a.T
    a.data[:] = 1.0
    return a


@pytest.fixture
def npz_dataset(tmp_path, rng):
    n, f, c = 80, 12, 4
    adj = _random_sym_adj(rng, n, 300)
    feats = sp.csr_matrix(
        (rng.random((n, f)) > 0.5).astype(np.float32))
    labels = rng.integers(0, c, n).astype(np.int64)
    np.savez(tmp_path / "cora.npz",
             adj_data=adj.data, adj_indices=adj.indices,
             adj_indptr=adj.indptr, adj_shape=np.array(adj.shape),
             attr_data=feats.data, attr_indices=feats.indices,
             attr_indptr=feats.indptr, attr_shape=np.array(feats.shape),
             labels=labels)
    return tmp_path, n, f, c


def test_planetoid_npz(npz_dataset):
    root, n, f, c = npz_dataset
    d = load_planetoid("cora", str(root), setting="gcn", seed=3)
    assert d.features.shape[1] == f
    assert d.num_classes <= c
    assert d.adj.is_symmetric()
    assert (np.asarray(d.adj.to_dense()).diagonal() == 0).all()
    # splits are disjoint
    s = set(d.idx_train) | set(d.idx_val) | set(d.idx_test)
    assert len(s) == len(d.idx_train) + len(d.idx_val) + len(d.idx_test)


def test_planetoid_nettack_lcc(npz_dataset):
    root, n, f, c = npz_dataset
    d = load_planetoid("cora", str(root), setting="nettack", seed=3)
    # LCC restriction keeps a connected graph
    g = d.adj.to_scipy()
    ncomp, _ = sp.csgraph.connected_components(g)
    assert ncomp == 1
    assert d.num_nodes <= n


def test_planetoid_pubmed_pickles(tmp_path, rng):
    n_train, n_test, n_rest, f, c = 20, 10, 30, 8, 3
    n = n_train + n_rest + n_test
    x = sp.csr_matrix(rng.random((n_train, f)).astype(np.float32))
    allx = sp.csr_matrix(rng.random((n_train + n_rest, f)).astype(np.float32))
    tx = sp.csr_matrix(rng.random((n_test, f)).astype(np.float32))
    y_oh = np.eye(c)[rng.integers(0, c, n_train)]
    ally_oh = np.eye(c)[rng.integers(0, c, n_train + n_rest)]
    ty_oh = np.eye(c)[rng.integers(0, c, n_test)]
    graph = {i: [int(j) for j in rng.integers(0, n, 3)] for i in range(n)}
    objs = {"x": x, "y": y_oh, "tx": tx, "ty": ty_oh, "allx": allx,
            "ally": ally_oh, "graph": graph}
    for part, obj in objs.items():
        with open(tmp_path / f"ind.pubmed.{part}", "wb") as fh:
            pickle.dump(obj, fh)
    test_idx = rng.permutation(np.arange(n_train + n_rest, n))
    with open(tmp_path / "ind.pubmed.test.index", "w") as fh:
        fh.write("\n".join(str(i) for i in test_idx))
    d = load_planetoid("pubmed", str(tmp_path), setting="gcn", seed=0)
    assert d.features.shape == (d.num_nodes, f)
    assert d.adj.is_symmetric()


def test_graphsaint_dir(tmp_path, rng):
    n, f, c = 60, 10, 5
    d = tmp_path / "flickr"
    os.makedirs(d)
    adj = _random_sym_adj(rng, n, 200)
    sp.save_npz(d / "adj_full.npz", adj)
    tr_mask = np.isin(np.arange(n), np.arange(0, 30))
    adj_train = sp.csr_matrix(
        adj.multiply(tr_mask[:, None]).multiply(tr_mask[None, :]))
    sp.save_npz(d / "adj_train.npz", adj_train)
    np.save(d / "feats.npy", rng.random((n, f)).astype(np.float64))
    # multi-label form for half, to exercise the argmax squash
    cm = {str(i): rng.integers(0, c).item() for i in range(n)}
    with open(d / "class_map.json", "w") as fh:
        json.dump(cm, fh)
    with open(d / "role.json", "w") as fh:
        json.dump({"tr": list(range(30)), "va": list(range(30, 45)),
                   "te": list(range(45, 60))}, fh)
    data = load_graphsaint("flickr", str(tmp_path))
    assert data.features.shape == (n, f)
    assert data.features.dtype == np.float32
    assert data.adj.is_symmetric()
    # standard-scaled on train nodes: near-zero mean there
    train_nodes = np.unique(
        sp.load_npz(d / "adj_train.npz").nonzero()[0])
    assert abs(data.features[train_nodes].mean()) < 0.2


def test_missing_file_message(tmp_path):
    with pytest.raises(FileNotFoundError, match="no.*egress|not found"):
        load_planetoid("citeseer", str(tmp_path))


def test_registry_routes_real_names(tmp_path):
    with pytest.raises(FileNotFoundError):
        get_dataset("citeseer", root=str(tmp_path))
    with pytest.raises(KeyError):
        get_dataset("not-a-dataset")


def test_hypergraph_mat_loader(tmp_path, rng):
    import scipy.io as scio

    from gcn_tpu.data.hypergraph_mat import (load_features_and_hypergraph,
                                             load_ft)

    n = 40
    mv = rng.random((n, 16)).astype(np.float64)
    gv = rng.random((n, 8)).astype(np.float64)
    x_cell = np.empty((1, 2), dtype=object)
    x_cell[0, 0] = mv
    x_cell[0, 1] = gv
    labels = rng.integers(1, 5, (n, 1))  # 1-based, as in the release
    indices = (rng.random((n, 1)) < 0.8).astype(np.float64)
    path = str(tmp_path / "toy.mat")
    scio.savemat(path, {"X": x_cell, "Y": labels, "indices": indices})

    fts, lbl, tr, te = load_ft(path, "GVCNN")
    assert fts.shape == (n, 8) and lbl.min() == 0
    assert len(tr) + len(te) == n

    fts2, lbl2, tr2, te2, h = load_features_and_hypergraph(
        path, k_neigs=[5],
        use_mvcnn_feature=True, use_gvcnn_feature=True,
        use_mvcnn_feature_for_structure=True,
        use_gvcnn_feature_for_structure=True)
    assert fts2.shape == (n, 24)          # concat of both modalities
    assert h.shape == (n, 2 * n)          # hyperedges from both modalities


def test_graphdata_masks():
    """Dataset(require_mask=True) accessor parity (dataio.py:28-35,
    164-181): boolean split masks + one-hot labels zeroed off-split."""
    from gcn_tpu.data import get_dataset

    d = get_dataset("synth-tiny", seed=0)
    tr, va, te, y_tr, y_va, y_te = d.masks()
    n, c = d.num_nodes, d.num_classes
    for m, idx in ((tr, d.idx_train), (va, d.idx_val), (te, d.idx_test)):
        assert m.dtype == bool and m.shape == (n,)
        assert np.array_equal(np.flatnonzero(m), np.sort(np.asarray(idx)))
    assert y_tr.shape == (n, c)
    sel = y_tr[np.asarray(d.idx_train)]
    assert np.array_equal(sel.argmax(1), d.labels[np.asarray(d.idx_train)])
    assert np.all(y_tr[~tr] == 0) and np.all(y_te[~te] == 0)
    assert np.all(y_tr.sum(1)[tr] == 1)
