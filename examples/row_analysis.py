#!/usr/bin/env python
"""Row-skew analysis CLI — equivalent of row_analysis/row_analysis.py.

Computes nnz-per-row CDFs for a set of datasets (or CSV dumps produced by
gcn_tpu.utils.writecsv) and renders the log-x step chart that motivates the
tiling design.

    python examples/row_analysis.py -g synth-pubmed synth-arxiv -o row.svg
    python examples/row_analysis.py --csv dumps/*.csv -o row.svg
"""

import argparse
import sys


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-g", "--graphs", nargs="*", default=["synth-pubmed"],
                    help="dataset names from the registry")
    ap.add_argument("--csv", nargs="*", default=[],
                    help="CSV matrix dumps (writecsv format)")
    ap.add_argument("-o", "--out", default="row.svg")
    ap.add_argument("--normalized", action="store_true",
                    help="analyze the GCN-normalized adjacency (adds self "
                         "loops) instead of the raw one")
    args = ap.parse_args()

    from gcn_tpu.analysis import plot_row_cdfs, row_cdf
    from gcn_tpu.data import get_dataset
    from gcn_tpu.graph.normalize import gcn_normalize
    from gcn_tpu.utils.writecsv import read as csv_read

    graphs = {}
    for name in args.graphs:
        g = get_dataset(name).adj
        if args.normalized:
            g = gcn_normalize(g)
        graphs[name] = g
    for path in args.csv:
        graphs[path] = csv_read(path)
    if not graphs:
        ap.error("nothing to analyze")

    for name, g in graphs.items():
        x, y = row_cdf(g)
        deg = x.astype(float)
        import numpy as np

        counts = np.diff(np.concatenate([[0.0], y])) * g.shape[0]
        mean = float((deg * counts).sum() / counts.sum())
        print(f"{name}: n={g.shape[0]} nnz={g.nnz} mean_deg={mean:.1f} "
              f"max_deg={int(x[-1])}")
    out = plot_row_cdfs(graphs, args.out)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
