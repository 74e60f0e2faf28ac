"""Offline/TensorBoard plotting for spectra, dims, samples and fields.

Rebuild of the plotting side of /root/reference/plot_utils.py:111-238 on
matplotlib (headless Agg).  The dim read-out math itself lives in
iddiff/id/readout.py; these functions only visualize.
"""
from __future__ import annotations

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from iddiff.id.readout import dims_from_spectra  # noqa: E402


def extract_sing_vals(svd, mode: str = "first"):
    """Aggregation modes over saved spectra (plot_utils.py:197-205):
    'first' = first datapoint only, 'all', 'mean' = pointwise average."""
    vals = svd["singular_values"] if isinstance(svd, dict) else svd
    vals = np.asarray(vals)
    if mode == "first":
        return vals[:1]
    if mode == "all":
        return vals
    if mode == "mean":
        return vals.mean(axis=0, keepdims=True)
    raise ValueError(f"aggregation mode '{mode}' unknown")


def spectrum_figure(spectra, ground_truth=None, title="Score Spectrum"):
    """Spectra line plot with ground-truth vline (plot_utils.py:111-139)."""
    spectra = np.asarray(spectra)
    fig, ax = plt.subplots(figsize=(10, 7))
    ax.grid(alpha=0.5)
    ax.set_title(title)
    d = spectra.shape[1]
    if ground_truth is not None:
        gts = ground_truth if isinstance(ground_truth, (list, tuple)) else [
            ground_truth
        ]
        for gt in gts:
            ax.axvline(x=d - gt, color="red", ls="--")
    for s in spectra:
        ax.plot(np.arange(1, d + 1), s)
    return fig


def dims_histogram_figure(spectra, title="Histogram of dimensions",
                          rule="reference", tail=None):
    """(plot_utils.py:207-238; `rule`/`tail` forwarded to the read-out —
    see iddiff/id/readout.py for the log_gap deviation)"""
    dims = dims_from_spectra(spectra, rule=rule, tail=tail)
    fig, ax = plt.subplots(figsize=(10, 7))
    ax.grid(alpha=0.5)
    ax.set_xlabel("dimension")
    ax.set_ylabel("count")
    ax.set_title(title)
    ax.hist(dims, bins=np.arange(max(1, dims.min() - 1), dims.max() + 2, 0.5))
    return fig


def image_grid(samples, ncols=4):
    """(N,H,W,C) float images → one (H',W',C) grid image in [0,1]."""
    samples = np.asarray(samples)
    n, h, w, c = samples.shape
    ncols = min(ncols, n)
    nrows = (n + ncols - 1) // ncols
    grid = np.zeros((nrows * h, ncols * w, c), dtype=np.float32)
    lo, hi = samples.min(), samples.max()
    normed = (samples - lo) / max(hi - lo, 1e-8)
    for i in range(n):
        r, col = divmod(i, ncols)
        grid[r * h:(r + 1) * h, col * w:(col + 1) * w] = normed[i]
    return grid


def scatter_figure(samples, data=None, title="Samples"):
    fig, ax = plt.subplots(figsize=(7, 7))
    if data is not None:
        data = np.asarray(data)
        ax.scatter(data[:, 0], data[:, 1], s=6, alpha=0.4, label="data")
    samples = np.asarray(samples)
    ax.scatter(samples[:, 0], samples[:, 1], s=6, alpha=0.6, label="samples")
    ax.legend()
    ax.set_title(title)
    ax.set_aspect("equal")
    return fig


def quiver_figure(grid_points, field, n, title="Score field"):
    fig, ax = plt.subplots(figsize=(7, 7))
    X = grid_points[:, 0].reshape(n, n)
    Y = grid_points[:, 1].reshape(n, n)
    U = field[:, 0].reshape(n, n)
    V = field[:, 1].reshape(n, n)
    ax.quiver(X, Y, U, V)
    ax.set_title(title)
    ax.set_aspect("equal")
    return fig
