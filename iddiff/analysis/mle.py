"""Levina–Bickel MLE intrinsic-dimension estimators (+bootstrap).

Two upstream variants exist and both are provided:

- `mle_id` follows the R package's `maxLikGlobalDimEst` — the estimator the
  reference's benchmark harness actually calls (benchmark.py:57-62 via
  rpy2): global ML, [1/(N(k-1)) ΣΣ log(T_k/T_j)]^{-1} (equivalently the
  inverse of the mean of per-point inverse estimates with a 1/(k-1)
  normalizer).
- `intrinsic_dim_sample_wise` follows the reference's standalone
  mle.py:6-28: per-point [Σ_{j<k} log(T_k/T_j) / (k-2)]^{-1} (the
  bias-corrected normalizer), aggregated by arithmetic mean in
  mle.py:31-52.
"""
from __future__ import annotations

import numpy as np


def _knn_distances(data: np.ndarray, k: int) -> np.ndarray:
    """(N, k) distances to the k nearest neighbors (excluding self)."""
    from sklearn.neighbors import NearestNeighbors

    nn = NearestNeighbors(n_neighbors=k + 1).fit(data)
    dist, _ = nn.kneighbors(data)
    return dist[:, 1:]  # drop self


def mle_id(data: np.ndarray, k: int = 5, average_inverse: bool = True) -> float:
    """Levina–Bickel estimate with k neighbors (mle.py:6-50)."""
    data = np.asarray(data, np.float64)
    dist = _knn_distances(data, k)
    dist = np.maximum(dist, 1e-12)
    logs = np.log(dist[:, -1][:, None] / dist[:, : k - 1])  # (N, k-1)
    inv_m = logs.mean(axis=1)  # 1/m_k per point
    if average_inverse:
        return float(1.0 / np.mean(inv_m))
    return float(np.mean(1.0 / np.maximum(inv_m, 1e-12)))


def intrinsic_dim_sample_wise(data: np.ndarray, k: int = 5) -> np.ndarray:
    """Per-point Levina–Bickel with the (k-2) corrected normalizer
    (mle.py:6-28); aggregate with .mean() for mle.py:31-52's estimate."""
    data = np.asarray(data, np.float64)
    dist = np.maximum(_knn_distances(data, k), 1e-12)
    logs = np.log(dist[:, -1][:, None] / dist[:, : k - 1])  # (N, k-1)
    return (k - 2) / logs.sum(axis=1)


def mle_id_bootstrap(data: np.ndarray, k: int = 5, n_bootstrap: int = 20,
                     frac: float = 0.9, seed: int = 0):
    """Bootstrap mean ± std (mle.py:52-94)."""
    rng = np.random.default_rng(seed)
    n = len(data)
    vals = []
    for _ in range(n_bootstrap):
        idx = rng.choice(n, size=int(frac * n), replace=False)
        vals.append(mle_id(data[idx], k=k))
    return float(np.mean(vals)), float(np.std(vals))
