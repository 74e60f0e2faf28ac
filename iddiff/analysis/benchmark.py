"""Classical-estimator benchmark harness over the registered datamodules.

Rebuild of /root/reference/benchmark.py:20-91 + run_benchmark.py: run MLE
(k=5, 20), local PCA and global PCA on the same datasets used by the score
estimator, writing a resumable CSV.  The reference calls the R package
`intrinsicDimension` through rpy2 (:10-17) for lPCA/pPCA; no R runtime
exists here, so both are implemented in numpy with the same semantics
(lPCA: Fukunaga–Olsen ratio threshold on local neighborhoods; pPCA:
Minka-style global PCA cutoff).
"""
from __future__ import annotations

import csv
import os

import numpy as np

from .mle import mle_id


def pca_id(data: np.ndarray, var_threshold: float = 0.95) -> int:
    """Global PCA: #components to reach var_threshold (benchmark.py:54-75)."""
    data = np.asarray(data, np.float64)
    x = data.reshape(len(data), -1)
    x = x - x.mean(0)
    s = np.linalg.svd(x, compute_uv=False)
    var = s**2
    frac = np.cumsum(var) / var.sum()
    return int(np.searchsorted(frac, var_threshold) + 1)


def local_pca_id(data: np.ndarray, n_neighbors: int = 20,
                 alpha: float = 0.05) -> float:
    """Fukunaga–Olsen local PCA: per-point #eigenvalues above alpha·λ_max,
    averaged (the R intrinsicDimension::pcaLocalDimEst equivalent)."""
    from sklearn.neighbors import NearestNeighbors

    x = np.asarray(data, np.float64).reshape(len(data), -1)
    nn = NearestNeighbors(n_neighbors=n_neighbors + 1).fit(x)
    _, idx = nn.kneighbors(x)
    dims = []
    for i in range(len(x)):
        nb = x[idx[i, 1:]] - x[idx[i, 1:]].mean(0)
        s = np.linalg.svd(nb, compute_uv=False)
        lam = s**2
        dims.append(int((lam > alpha * lam[0]).sum()))
    return float(np.mean(dims))


ESTIMATORS = {
    "mle_5": lambda d: mle_id(d, k=5),
    "mle_20": lambda d: mle_id(d, k=20),
    "lpca": lambda d: local_pca_id(d),
    "pca": lambda d: float(pca_id(d)),
}


class Benchmark:
    """CSV-resumable harness (benchmark.py:24-51)."""

    def __init__(self, out_csv: str, estimators=None):
        self.out_csv = out_csv
        self.estimators = estimators or list(ESTIMATORS)
        self.done = set()
        if os.path.exists(out_csv):
            with open(out_csv) as f:
                for row in csv.DictReader(f):
                    self.done.add((row["dataset"], row["estimator"]))

    def run(self, datasets: dict, max_points: int = 2000):
        """datasets: name -> (N, ...) array with known manifolds."""
        new_file = not os.path.exists(self.out_csv)
        with open(self.out_csv, "a", newline="") as f:
            w = csv.writer(f)
            if new_file:
                w.writerow(["dataset", "estimator", "estimate"])
            for name, data in datasets.items():
                flat = np.asarray(data).reshape(len(data), -1)[:max_points]
                for est in self.estimators:
                    if (name, est) in self.done:
                        continue
                    val = ESTIMATORS[est](flat)
                    w.writerow([name, est, f"{val:.4f}"])
                    f.flush()
                    self.done.add((name, est))
        return self.out_csv
