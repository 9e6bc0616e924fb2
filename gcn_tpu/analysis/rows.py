"""Row-skew analysis: nnz-per-row CDFs.

Equivalent of the reference's ``row_analysis/row_analysis.py`` — the
offline analysis that motivates the tiling design (SURVEY.md §2b). Input is
either a CSRGraph / scipy matrix or a CSV written by
``gcn_tpu.utils.writecsv``; output is the (x=nnz, y=fraction of rows) step
CDF and optionally a log-x plot (row_analysis.py:100-150).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def nnz_per_row(g) -> np.ndarray:
    if hasattr(g, "indptr"):
        return np.diff(np.asarray(g.indptr))
    raise TypeError("expected CSRGraph or scipy CSR")


def row_cdf(g) -> Tuple[np.ndarray, np.ndarray]:
    """-> (sorted unique nnz values, cumulative fraction of rows)."""
    deg = nnz_per_row(g)
    vals, counts = np.unique(deg, return_counts=True)
    return vals, np.cumsum(counts) / deg.size


def plot_row_cdfs(graphs: Dict[str, object], out_path: str = "row.svg"):
    """Log-x step plot of nnz-per-row CDFs, one curve per named graph."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 4.5))
    for name, g in graphs.items():
        x, y = row_cdf(g)
        ax.step(np.maximum(x, 1), y, where="post", label=name)
    ax.set_xscale("log")
    ax.set_xlabel("nnz per row")
    ax.set_ylabel("fraction of rows")
    ax.legend(loc="lower right", fontsize=8)
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(out_path)
    plt.close(fig)
    return out_path
