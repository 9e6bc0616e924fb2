from gcn_tpu.analysis.rows import nnz_per_row, row_cdf, plot_row_cdfs

__all__ = ["nnz_per_row", "row_cdf", "plot_row_cdfs"]
