"""Dimension read-out from singular-value spectra.

Exact reimplementation of the reference's rule
(/root/reference/plot_utils.py:158-238, plot_distribution/plot_dims):
normalized successive gaps δ_i = (s_i − s_{i+1}) / (s_1 − s_2) for
i = 1..len(s)-2 (0-indexed), softmax over the gaps, and
dim = len(soft) − argmax(soft).

Host-side numpy: the spectra are tiny (d floats per datapoint).
"""
from __future__ import annotations

import numpy as np


def _softmax(x):
    e = np.exp(x - np.max(x))
    return e / e.sum(axis=0)


def dim_from_spectrum(s) -> int:
    """dim = len(soft) − argmax(soft) (plot_utils.py:173-183)."""
    s = np.asarray(s, dtype=np.float64)
    norm_factor = s[1] - s[2]
    diff = (s[1:-1] - s[2:]) / norm_factor
    soft = _softmax(diff)
    return int(len(soft) - soft.argmax())


def softmax_gap_dims(singular_values) -> list[int]:
    """Dims for a list/array of spectra (plot_utils.py:224-230)."""
    return [dim_from_spectrum(s) for s in np.asarray(singular_values)]


def dims_from_spectra(spectra) -> np.ndarray:
    return np.asarray(softmax_gap_dims(spectra))
