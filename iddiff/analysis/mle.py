"""Levina–Bickel MLE intrinsic-dimension estimator (+bootstrap).

Rebuild of /root/reference/mle.py:6-94, vectorized: for each point, the ID
estimate is m_k(x) = [1/(k-1) Σ_{j<k} log(T_k(x)/T_j(x))]^{-1} with T_j the
distance to the j-th nearest neighbor; the dataset estimate averages the
inverses (the MacKay–Ghahramani correction) over points.
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
