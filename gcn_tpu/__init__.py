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


def __getattr__(name):
    # lazy top-level conveniences (keep `import gcn_tpu` jax-free)
    if name == "GCN":
        from gcn_tpu.models import GCN
        return GCN
    if name == "HGNN":
        from gcn_tpu.models import HGNN
        return HGNN
    if name == "get_dataset":
        from gcn_tpu.data import get_dataset
        return get_dataset
    if name == "spmm":
        from gcn_tpu.ops import spmm
        return spmm
    raise AttributeError(f"module 'gcn_tpu' has no attribute {name!r}")


__all__ = ["__version__", "GCN", "HGNN", "get_dataset", "spmm"]
