#!/usr/bin/env python
"""HGNN training driver — equivalent of the reference's pyhgnn/train.py.

Reads the YAML config (gcn_tpu/configs/hgnn.yaml mirrors
pyhgnn/config/config.yaml), loads the ModelNet40/NTU2012 .mat visual
features, builds the KNN hypergraph G = DV^-1/2 H W DE^-1 H^T DV^-1/2, and
trains the 2-layer HGNN with MultiStepLR + best-val selection
(pyhgnn/train.py:47-155).

This environment has no network egress; when the .mat files are absent,
``--synthetic`` (the default fallback) generates a feature cloud with the
same shape statistics so the full pipeline still runs end-to-end.
"""

import argparse
import os
import sys
import time

import numpy as np


def synthetic_visual_features(n=800, f=2048, classes=40, seed=0):
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, classes, n).astype(np.int64)
    centroids = rng.standard_normal((classes, f)).astype(np.float32)
    fts = centroids[labels] + 0.6 * rng.standard_normal((n, f)).astype(
        np.float32)
    idx = rng.random(n) < 0.8
    return fts, labels, np.flatnonzero(idx), np.flatnonzero(~idx)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    here = os.path.dirname(os.path.abspath(__file__))
    ap.add_argument("--config", default=os.path.join(
        here, "..", "gcn_tpu", "configs", "hgnn.yaml"))
    ap.add_argument("--dataset", default=None,
                    help="ModelNet40 | NTU2012 (default: config on_dataset)")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--synthetic", action="store_true",
                    help="force the synthetic stand-in")
    ap.add_argument("--synthetic-n", type=int, default=800)
    ap.add_argument("--factored", action="store_true",
                    help="apply G as two sparse factors (TwoHopAdj) instead "
                         "of materializing the dense chain — the scalable "
                         "path for large hypergraphs")
    args = ap.parse_args()

    from gcn_tpu.graph.hypergraph import construct_H_with_KNN, generate_G_from_H
    from gcn_tpu.models.hgnn import HGNN
    from gcn_tpu.utils.config import get_config

    cfg = get_config(args.config)
    name = args.dataset or cfg["on_dataset"]
    epochs = args.epochs if args.epochs is not None else cfg["max_epoch"]
    mat_path = os.path.expanduser(
        cfg["modelnet40_ft"] if name.lower() == "modelnet40"
        else cfg["ntu2012_ft"])

    t0 = time.time()
    if not args.synthetic and os.path.exists(mat_path):
        from gcn_tpu.data.hypergraph_mat import load_features_and_hypergraph

        fts, labels, idx_train, idx_test, h = load_features_and_hypergraph(
            mat_path,
            m_prob=cfg["m_prob"], k_neigs=cfg["K_neigs"],
            is_prob_h=cfg["is_probH"],
            use_mvcnn_feature=cfg["use_mvcnn_feature"],
            use_gvcnn_feature=cfg["use_gvcnn_feature"],
            use_mvcnn_feature_for_structure=cfg[
                "use_mvcnn_feature_for_structure"],
            use_gvcnn_feature_for_structure=cfg[
                "use_gvcnn_feature_for_structure"])
    else:
        if not args.synthetic:
            print(f"[train_hgnn] {mat_path} not found; using synthetic "
                  f"stand-in (no-egress environment)")
        fts, labels, idx_train, idx_test = synthetic_visual_features(
            n=args.synthetic_n)
        h = None
        for k in cfg["K_neigs"]:
            tmp = construct_H_with_KNN(fts[:, :64], k_neig=int(k),
                                       is_prob=cfg["is_probH"],
                                       m_prob=cfg["m_prob"])
            h = tmp if h is None else np.hstack([h, tmp])
    if args.factored:
        from gcn_tpu.graph.hypergraph import generate_G_factors

        g = generate_G_factors(h)
    else:
        g = generate_G_from_H(h)
    n_class = int(labels.max()) + 1
    print(f"[{name}] n={fts.shape[0]} f={fts.shape[1]} classes={n_class} "
          f"hyperedges={h.shape[1]} (prepared in {time.time()-t0:.1f}s)")

    model = HGNN(in_ch=fts.shape[1], n_class=n_class, n_hid=cfg["n_hid"],
                 dropout=cfg["drop_out"], lr=cfg["lr"],
                 weight_decay=cfg["weight_decay"],
                 milestones=cfg["milestones"], gamma=cfg["gamma"])
    model.fit(fts, g, labels, idx_train, idx_val=idx_test,
              num_epochs=epochs, verbose=True,
              print_freq=cfg.get("print_freq", 50))
    print(model.timers.report())
    acc = model.test(idx_test)
    return acc


if __name__ == "__main__":
    sys.exit(0 if main() > 0.5 else 1)
