"""Numerical parity vs an independent torch implementation of the
reference's GCN math.

The reference model is torch (pygcn/gcn1.py): layer = A @ (X W) + b with
W, b ~ U(-1/sqrt(out), 1/sqrt(out)) (gcn1.py:35-38), relu between layers,
log_softmax head, masked NLL loss, Adam with weight decay. Here the same
math is written in torch inside the test (not copied — just the equations)
with weights transplanted from our initialization, and forward activations
/ loss / gradients are compared elementwise. This is the 'golden numerics'
check SURVEY.md §4 calls for.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from gcn_tpu.data import get_dataset
from gcn_tpu.graph.normalize import gcn_normalize
from gcn_tpu.models.gcn_core import gcn_forward, init_gcn_params
from gcn_tpu.ops.adjacency import dense_adjacency
from gcn_tpu.train.metrics import masked_nll


@pytest.fixture(scope="module")
def setup():
    data = get_dataset("synth-tiny", seed=7)
    g = gcn_normalize(data.adj)
    params = init_gcn_params(jax.random.PRNGKey(0), data.num_features, 16,
                             data.num_classes)
    return data, g, params


def _torch_forward(params, x, a, with_relu=True):
    """The reference's forward math (gcn1.py:40-58, 103-145) in torch."""
    w1 = torch.tensor(np.asarray(params["gc1"]["w"]), dtype=torch.float64)
    b1 = torch.tensor(np.asarray(params["gc1"]["b"]), dtype=torch.float64)
    w2 = torch.tensor(np.asarray(params["gc2"]["w"]), dtype=torch.float64)
    b2 = torch.tensor(np.asarray(params["gc2"]["b"]), dtype=torch.float64)
    w1.requires_grad_(True)
    w2.requires_grad_(True)
    h1 = a @ (x @ w1) + b1
    h1r = torch.relu(h1)
    h2 = a @ (h1r @ w2) + b2
    return h1, h2, torch.log_softmax(h2, dim=1), (w1, b1, w2, b2)


def test_forward_activations_allclose(setup):
    data, g, params = setup
    x_t = torch.tensor(data.features, dtype=torch.float64)
    a_t = torch.tensor(g.to_dense(), dtype=torch.float64)
    _, _, lp_t, _ = _torch_forward(params, x_t, a_t)

    lp_j = gcn_forward(params, jnp.asarray(data.features),
                       dense_adjacency(g), orders=("a_xw", "a_xw"),
                       train=False)
    np.testing.assert_allclose(np.asarray(lp_j), lp_t.detach().numpy(),
                               rtol=2e-4, atol=2e-5)


def test_loss_and_weight_grads_allclose(setup):
    data, g, params = setup
    x_t = torch.tensor(data.features, dtype=torch.float64)
    a_t = torch.tensor(g.to_dense(), dtype=torch.float64)
    y_t = torch.tensor(data.labels)
    idx = torch.tensor(np.asarray(data.idx_train, dtype=np.int64))
    _, _, lp_t, (w1, b1, w2, b2) = _torch_forward(params, x_t, a_t)
    loss_t = torch.nn.functional.nll_loss(lp_t[idx], y_t[idx])
    loss_t.backward()

    def loss_jax(p):
        lp = gcn_forward(p, jnp.asarray(data.features), dense_adjacency(g),
                         orders=("a_xw", "a_xw"), train=False)
        return masked_nll(lp, jnp.asarray(data.labels),
                          jnp.asarray(np.asarray(data.idx_train),
                                      dtype=jnp.int32))

    loss_j, grads = jax.value_and_grad(loss_jax)(params)
    np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(grads["gc1"]["w"]),
                               w1.grad.numpy(), rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(np.asarray(grads["gc2"]["w"]),
                               w2.grad.numpy(), rtol=1e-3, atol=1e-6)


def test_init_distribution_matches_reference():
    """W, b ~ U(-s, s) with s = 1/sqrt(fan_out) (gcn1.py:35-38)."""
    params = init_gcn_params(jax.random.PRNGKey(3), 100, 64, 10)
    for layer, fan_out in (("gc1", 64), ("gc2", 10)):
        s = 1.0 / np.sqrt(fan_out)
        w = np.asarray(params[layer]["w"])
        assert w.min() >= -s and w.max() <= s
        assert abs(w.std() - s / np.sqrt(3)) < 0.05 * s  # uniform stddev
        b = np.asarray(params[layer]["b"])
        assert b.min() >= -s and b.max() <= s


def test_hypergraph_H_and_G_match_torch_math(rng):
    """H and G construction pinned to an independent torch implementation
    of the reference formulas: d = true Euclidean (hypergraph_utils.py:23),
    H[v,c] = exp(-d^2/(m*avg_d)^2) (:151),
    G = Dv^-1/2 H W De^-1 H^T Dv^-1/2 (:97-125)."""
    from gcn_tpu.graph.hypergraph import construct_H_with_KNN, generate_G_from_H

    n, f, k = 40, 8, 6
    feats = rng.standard_normal((n, f)).astype(np.float32)

    x_t = torch.tensor(feats, dtype=torch.float64)
    d_t = torch.cdist(x_t, x_t)          # true Euclidean distances
    h_t = torch.zeros((n, n), dtype=torch.float64)
    for c in range(n):
        dv = d_t[c].clone()
        dv[c] = 0.0
        avg = dv.mean()
        nearest = torch.argsort(dv)[:k]
        if not (nearest == c).any():
            nearest[-1] = c
        h_t[nearest, c] = torch.exp(-dv[nearest] ** 2 / avg ** 2)

    h = construct_H_with_KNN(feats, k_neig=k)
    # Neighbor *sets* must match; ties in argsort may order equals
    # differently, so compare the weight matrices, not the loops.
    np.testing.assert_allclose(h, h_t.numpy(), rtol=1e-4, atol=1e-6)

    dv_deg = h_t.sum(1)
    de_deg = h_t.sum(0)
    g_t = (torch.diag(dv_deg ** -0.5) @ h_t @ torch.diag(1.0 / de_deg)
           @ h_t.T @ torch.diag(dv_deg ** -0.5))
    g = generate_G_from_H(h)
    np.testing.assert_allclose(g.to_dense(), g_t.numpy(), rtol=1e-4,
                               atol=1e-6)


def test_hgnn_forward_matches_torch_math(rng):
    """HGNN_conv: x -> G @ (x W + b) (HGNN.py:27-38) written independently
    in torch, with transplanted weights."""
    from gcn_tpu.graph.hypergraph import construct_H_with_KNN, generate_G_from_H
    from gcn_tpu.models.hgnn import hgnn_forward, init_hgnn_params
    from gcn_tpu.ops.adjacency import dense_adjacency

    n, f, hid, c = 50, 12, 8, 4
    feats = rng.standard_normal((n, f)).astype(np.float32)
    h = construct_H_with_KNN(feats, k_neig=5)
    g = generate_G_from_H(h)  # CSRGraph
    g_dense = g.to_dense()
    params = init_hgnn_params(jax.random.PRNGKey(1), f, hid, c)

    g_t = torch.tensor(g_dense, dtype=torch.float64)
    x_t = torch.tensor(feats, dtype=torch.float64)
    w1 = torch.tensor(np.asarray(params["hgc1"]["w"]), dtype=torch.float64)
    b1 = torch.tensor(np.asarray(params["hgc1"]["b"]), dtype=torch.float64)
    w2 = torch.tensor(np.asarray(params["hgc2"]["w"]), dtype=torch.float64)
    b2 = torch.tensor(np.asarray(params["hgc2"]["b"]), dtype=torch.float64)
    h1 = torch.relu(g_t @ (x_t @ w1 + b1))
    ref = g_t @ (h1 @ w2 + b2)

    adj = dense_adjacency(g)
    out = hgnn_forward(params, jnp.asarray(feats), adj, train=False)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(),
                               rtol=2e-4, atol=2e-5)
