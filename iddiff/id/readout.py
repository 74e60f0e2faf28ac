"""Dimension read-out from singular-value spectra.

Two rules:

``rule="reference"`` — exact reimplementation of the reference's rule
(/root/reference/plot_utils.py:158-238, plot_distribution/plot_dims):
normalized successive gaps δ_i = (s_i − s_{i+1}) / (s_1 − s_2) for
i = 1..len(s)-2 (0-indexed), softmax over the gaps, and
dim = len(soft) − argmax(soft).  An optional ``tail`` restricts the
argmax to the last ``tail`` gaps (plot_utils.py:178-180).

``rule="log_gap"`` — scale-invariant variant (rebuild deviation,
RESULTS.md "The +1 is the read-out"): the same largest-gap idea applied
to the LOG spectrum, i.e. the boundary is placed at the largest ratio
s_i / s_{i+1} instead of the largest absolute difference s_i − s_{i+1}.

Why the deviation exists: the singular values of the centered score
matrix carry the 1/σ scale of the normal-space score response, so the
drop from the normal bulk (~√K/σ) to anything below it is the largest
ABSOLUTE difference almost surely — the reference rule therefore cuts
immediately after the bulk and counts every intermediate "straggler"
direction (e.g. a normal direction the network scores weakly) as
tangent.  Measured on this rebuild's converged paper models the
reference rule reads truth+1 on squares-10/blobs-10 (d=1024) and
truth+1 on line, while the ratio rule reads the exact truth on every
known-ID case (squares-10→10, blobs-10→10, line→1, ksphere-10/50→10/50,
mammoth→2) from the same spectra.  Ratios are the natural
scale-free gap statistic for spectra whose absolute scale is arbitrary
(it depends on t, K and the SDE's σ(t)).

The reference rule stays the default everywhere parity matters; callers
opt into ``log_gap`` via ``config.dim_estimation.readout = "log_gap"``.

Host-side numpy: the spectra are tiny (d floats per datapoint).
"""
from __future__ import annotations

import numpy as np


def _softmax(x):
    e = np.exp(x - np.max(x))
    return e / e.sum(axis=0)


def dim_from_spectrum(s, rule: str = "reference", tail: int | None = None) -> int:
    """dim = number of singular values after the largest spectral gap.

    rule="reference": largest (s_i − s_{i+1})/(s_1 − s_2) via softmax-argmax
    (plot_utils.py:173-183).  rule="log_gap": largest s_i/s_{i+1}.
    ``tail`` restricts the search to the last ``tail`` gaps (reference's
    plot knob, plot_utils.py:178-180); applies to either rule.
    """
    s = np.asarray(s, dtype=np.float64)
    if rule == "reference":
        norm_factor = s[1] - s[2]
        diff = (s[1:-1] - s[2:]) / norm_factor
        soft = _softmax(diff)
    elif rule == "log_gap":
        sc = np.clip(s, 1e-300, None)
        soft = np.log(sc[1:-1]) - np.log(sc[2:])
    else:
        raise ValueError(f"unknown read-out rule {rule!r}")
    if tail:
        soft = soft[-tail:]
    return int(len(soft) - soft.argmax())


def softmax_gap_dims(singular_values, rule: str = "reference",
                     tail: int | None = None) -> list[int]:
    """Dims for a list/array of spectra (plot_utils.py:224-230)."""
    return [dim_from_spectrum(s, rule=rule, tail=tail)
            for s in np.asarray(singular_values)]


def dims_from_spectra(spectra, rule: str = "reference",
                      tail: int | None = None) -> np.ndarray:
    return np.asarray(softmax_gap_dims(spectra, rule=rule, tail=tail))
