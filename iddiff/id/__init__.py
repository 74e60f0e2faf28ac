from .estimator import (
    score_spectrum_fn,
    num_score_batches,
    collect_spectra,
    make_spectra_fn,
)
from .readout import dims_from_spectra, dim_from_spectrum, softmax_gap_dims
from .io import save_spectra, load_spectra

__all__ = [
    "score_spectrum_fn",
    "num_score_batches",
    "collect_spectra",
    "make_spectra_fn",
    "dims_from_spectra",
    "dim_from_spectrum",
    "softmax_gap_dims",
    "save_spectra",
    "load_spectra",
]
