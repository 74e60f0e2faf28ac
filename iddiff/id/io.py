"""Spectrum pickle I/O, format-compatible with the reference's artifacts.

The reference saves {'singular_values': [list, ...]} to
logs/<name>/svd/<name>.pkl (/root/reference/dim_reduction.py:206-211) and the
analysis tools index svd['singular_values'] (plot_utils.py:197-205).  We keep
that schema exactly so spectra produced here feed the same offline plots.
"""
from __future__ import annotations

import os
import pickle
from pathlib import Path

import numpy as np


def save_spectra(spectra, save_path: str, name: str = "svd") -> str:
    Path(save_path).mkdir(parents=True, exist_ok=True)
    path = os.path.join(save_path, f"{name}.pkl")
    info = {"singular_values": [list(map(float, s)) for s in np.asarray(spectra)]}
    with open(path, "wb") as f:
        pickle.dump(info, f)
    return path


def load_spectra(path: str):
    with open(path, "rb") as f:
        info = pickle.load(f)
    return info["singular_values"]
