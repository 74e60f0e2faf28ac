from .plots import (
    spectrum_figure,
    dims_histogram_figure,
    image_grid,
    scatter_figure,
    quiver_figure,
)
from .evaluation import psnr, ssim, batch_psnr, batch_ssim, lpips_distance
from .mle import mle_id, mle_id_bootstrap
from .isomap import isomap_id, isomap_errors
from .benchmark import Benchmark, pca_id, local_pca_id
from .fid import fid, frechet_distance, pixel_fid

__all__ = [
    "spectrum_figure",
    "dims_histogram_figure",
    "image_grid",
    "scatter_figure",
    "quiver_figure",
    "psnr",
    "ssim",
    "batch_psnr",
    "batch_ssim",
    "lpips_distance",
    "mle_id",
    "mle_id_bootstrap",
    "isomap_id",
    "isomap_errors",
    "Benchmark",
    "pca_id",
    "local_pca_id",
    "fid",
    "frechet_distance",
    "pixel_fid",
]
