from .plots import (
    spectrum_figure,
    dims_histogram_figure,
    image_grid,
    scatter_figure,
    quiver_figure,
)

__all__ = [
    "spectrum_figure",
    "dims_histogram_figure",
    "image_grid",
    "scatter_figure",
    "quiver_figure",
]
