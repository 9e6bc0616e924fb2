"""gcn_tpu — TPU-native GNN message-passing framework.

A brand-new JAX / XLA / Pallas framework with the capabilities of the
`guohaoqiang/gcn` reference (see SURVEY.md): 2-layer GCN training (the
gcn1..gcn6 variant ladder), hypergraph GNNs (HGNN), and a high-performance
sparse-adjacency x dense-feature SpMM core over a reordered, row-panel tiled
adjacency — plus multi-chip scaling over `jax.sharding.Mesh` which the
reference (single-GPU) does not have.

Layout:
    graph/     CSR/COO containers, normalization, splits, hypergraph math
    data/      dataset registry: synthetic, planetoid, graphsaint, .mat
    reorder/   vertex reordering: degree / BFS / RCM / Gorder / Rabbit (+ C++)
    tile/      row-panel segment tiler producing the TPU adjacency format
    ops/       SpMM strategies: dense, COO segment-sum, bucketed ELL, Pallas
    models/    GCN (v1..v6 capability ladder), HGNN
    train/     fit/eval loops, optimizers, metrics, checkpointing
    parallel/  mesh setup, graph partitioner, halo exchange, sharded train step
    utils/     named timers, logging, CSV dumps, row-distribution analysis
"""

from gcn_tpu.version import __version__

__all__ = ["__version__"]
