"""Isomap reconstruction-error ID probe.

Rebuild of /root/reference/isomap.py:34-79: embed the data with Isomap at
increasing target dimensions and read the intrinsic dimension off the elbow
of the reconstruction error curve.
"""
from __future__ import annotations

import numpy as np


def isomap_errors(data: np.ndarray, dims, n_neighbors: int = 10):
    from sklearn.manifold import Isomap

    errors = []
    for d in dims:
        iso = Isomap(n_neighbors=n_neighbors, n_components=int(d))
        iso.fit(np.asarray(data, np.float64))
        errors.append(float(iso.reconstruction_error()))
    return np.asarray(errors)


def isomap_id(data: np.ndarray, max_dim: int = 10, n_neighbors: int = 10,
              rel_tol: float = 0.05) -> int:
    """Smallest dimension whose error is within rel_tol of the curve floor."""
    dims = list(range(1, max_dim + 1))
    errs = isomap_errors(data, dims, n_neighbors)
    floor = errs.min()
    span = max(errs.max() - floor, 1e-12)
    ok = (errs - floor) / span <= rel_tol
    return int(dims[int(np.argmax(ok))])
