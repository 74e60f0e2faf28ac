from .estimator import (
    score_spectrum_fn,
    num_score_batches,
    collect_spectra,
)
from .readout import dims_from_spectra, dim_from_spectrum, softmax_gap_dims
from .io import save_spectra, load_spectra

__all__ = [
    "score_spectrum_fn",
    "num_score_batches",
    "collect_spectra",
    "dims_from_spectra",
    "dim_from_spectrum",
    "softmax_gap_dims",
    "save_spectra",
    "load_spectra",
]
