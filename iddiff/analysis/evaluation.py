"""Image metrics: PSNR / SSIM (numpy), LPIPS gated on the optional package.

Rebuild of /root/reference/evaluation_tools.py:15-80 (numpy/cv2 PSNR+SSIM)
without cv2 dependency; SSIM uses the standard 11×11 Gaussian window,
matching the cv2-based constants (K1=0.01, K2=0.03).
Images are NHWC or HWC float arrays; `data_range` defaults to max-min.
"""
from __future__ import annotations

import numpy as np


def psnr(a, b, data_range: float | None = None) -> float:
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if data_range is None:
        data_range = max(a.max() - a.min(), 1e-8)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return float(10 * np.log10(data_range**2 / mse))


def _gaussian_window(size=11, sigma=1.5):
    g = np.exp(-((np.arange(size) - size // 2) ** 2) / (2 * sigma**2))
    g /= g.sum()
    return np.outer(g, g)


def _filter2(img, win):
    from scipy.signal import convolve2d

    return convolve2d(img, win, mode="valid")


def ssim(a, b, data_range: float | None = None) -> float:
    """Mean SSIM over channels (evaluation_tools.py:34-80 semantics)."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if a.ndim == 2:
        a, b = a[..., None], b[..., None]
    if data_range is None:
        data_range = max(a.max() - a.min(), 1e-8)
    C1 = (0.01 * data_range) ** 2
    C2 = (0.03 * data_range) ** 2
    # window never larger than the image (an 11x11 'valid' conv on a
    # smaller image would yield an empty array -> NaN)
    win = _gaussian_window(size=min(11, a.shape[0], a.shape[1]))
    vals = []
    for c in range(a.shape[-1]):
        x, y = a[..., c], b[..., c]
        mu_x, mu_y = _filter2(x, win), _filter2(y, win)
        mu_x2, mu_y2, mu_xy = mu_x**2, mu_y**2, mu_x * mu_y
        sx = _filter2(x * x, win) - mu_x2
        sy = _filter2(y * y, win) - mu_y2
        sxy = _filter2(x * y, win) - mu_xy
        s = ((2 * mu_xy + C1) * (2 * sxy + C2)) / (
            (mu_x2 + mu_y2 + C1) * (sx + sy + C2)
        )
        vals.append(s.mean())
    return float(np.mean(vals))


def batch_psnr(a, b, data_range=None):
    return float(np.mean([psnr(x, y, data_range) for x, y in zip(a, b)]))


def batch_ssim(a, b, data_range=None):
    return float(np.mean([ssim(x, y, data_range) for x, y in zip(a, b)]))


def ms_ssim(a, b, data_range: float | None = None, weights=None) -> float:
    """Multi-scale SSIM (Wang et al. 2003): the weights-free perceptual
    stand-in for LPIPS (PairedCallback.py:6 uses the lpips package, which
    needs downloaded AlexNet weights — unavailable in a no-egress image;
    deviation documented in MIGRATION.md).

    Contrast/structure terms at 5 dyadic scales (2x2 mean-pool between
    scales), luminance at the coarsest, combined with the standard
    exponents (0.0448, 0.2856, 0.3001, 0.2363, 0.1333).
    """
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if a.ndim == 2:
        a, b = a[..., None], b[..., None]
    if data_range is None:
        data_range = max(a.max() - a.min(), 1e-8)
    if weights is None:
        weights = [0.0448, 0.2856, 0.3001, 0.2363, 0.1333]
    # keep only as many scales as the image supports (win=11 after pooling)
    n_scales = len(weights)
    min_side = min(a.shape[0], a.shape[1])
    if min_side < 11:
        # too small for the 11x11 window even at scale 0: plain SSIM
        return ssim(a, b, data_range)
    while n_scales > 1 and min_side // (2 ** (n_scales - 1)) < 11:
        n_scales -= 1
    weights = np.asarray(weights[:n_scales])
    weights = weights / weights.sum()

    C1 = (0.01 * data_range) ** 2
    C2 = (0.03 * data_range) ** 2
    win = _gaussian_window()

    def _pool(img):
        h, w = img.shape[0] // 2 * 2, img.shape[1] // 2 * 2
        img = img[:h, :w]
        return 0.25 * (img[::2, ::2] + img[1::2, ::2]
                       + img[::2, 1::2] + img[1::2, 1::2])

    vals = []
    for c in range(a.shape[-1]):
        x, y = a[..., c], b[..., c]
        mcs = []
        for s in range(n_scales):
            mu_x, mu_y = _filter2(x, win), _filter2(y, win)
            sx = _filter2(x * x, win) - mu_x**2
            sy = _filter2(y * y, win) - mu_y**2
            sxy = _filter2(x * y, win) - mu_x * mu_y
            cs = ((2 * sxy + C2) / (sx + sy + C2)).mean()
            if s == n_scales - 1:
                lum = ((2 * mu_x * mu_y + C1)
                       / (mu_x**2 + mu_y**2 + C1)).mean()
                mcs.append(lum * cs)
            else:
                mcs.append(cs)
                x, y = _pool(x), _pool(y)
        mcs = np.clip(np.asarray(mcs), 1e-8, None)
        vals.append(float(np.prod(mcs ** weights)))
    return float(np.mean(vals))


def batch_ms_ssim(a, b, data_range=None):
    return float(np.mean([ms_ssim(x, y, data_range) for x, y in zip(a, b)]))


def perceptual_distance(a, b):
    """Best available perceptual metric: LPIPS when the optional package is
    installed, else 1 - MS-SSIM (both in [0, ~1], lower = more similar)."""
    try:
        return {"lpips": lpips_distance(a, b)}
    except ImportError:
        return {"ms_ssim_dist": 1.0 - float(
            np.mean([ms_ssim(x, y) for x, y in zip(a, b)])
        )}


def lpips_distance(a, b):
    """LPIPS perceptual distance (PairedCallback.py:6).  Requires the
    optional `lpips` package (torch); unavailable in this image."""
    try:
        import lpips  # noqa: F401
        import torch
    except ImportError as e:
        raise ImportError(
            "LPIPS requires the optional 'lpips' package (not installed in "
            "this environment); PSNR/SSIM are available without it."
        ) from e
    net = lpips.LPIPS(net="alex")
    ta = torch.from_numpy(np.asarray(a)).permute(0, 3, 1, 2).float()
    tb = torch.from_numpy(np.asarray(b)).permute(0, 3, 1, 2).float()
    with torch.no_grad():
        return float(net(ta, tb).mean())
