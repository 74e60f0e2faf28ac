"""Fréchet distance machinery with a pluggable feature extractor.

The reference ships legacy TF-GAN Inception/FID utilities
(/root/reference/evaluation.py:16-146, unused by its main flow).  This
environment has no network egress for Inception weights, so the FID math
(feature means/covariances + Fréchet distance) is implemented against ANY
feature extractor: pass Inception features when available, raw pixels for a
"pixel FID", or a trained score net's pooled features.
"""
from __future__ import annotations

import numpy as np
from scipy import linalg


def feature_statistics(features: np.ndarray):
    """(N, D) features → (mean (D,), covariance (D, D))."""
    feats = np.asarray(features, np.float64).reshape(len(features), -1)
    mu = feats.mean(axis=0)
    sigma = np.cov(feats, rowvar=False)
    return mu, np.atleast_2d(sigma)


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """‖μ1−μ2‖² + tr(Σ1 + Σ2 − 2(Σ1 Σ2)^{1/2}) (evaluation.py FID math)."""
    mu1, mu2 = np.asarray(mu1), np.asarray(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1 @ sigma2, disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean, _ = linalg.sqrtm(
            (sigma1 + offset) @ (sigma2 + offset), disp=False
        )
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))


def fid(real_features, fake_features) -> float:
    mu_r, s_r = feature_statistics(real_features)
    mu_f, s_f = feature_statistics(fake_features)
    return frechet_distance(mu_r, s_r, mu_f, s_f)


def pixel_fid(real_images, fake_images, max_dim: int = 512) -> float:
    """FID on (downsampled) raw pixels — a weights-free sanity metric."""
    def prep(imgs):
        x = np.asarray(imgs, np.float64).reshape(len(imgs), -1)
        if x.shape[1] > max_dim:
            idx = np.linspace(0, x.shape[1] - 1, max_dim).astype(int)
            x = x[:, idx]
        return x

    return fid(prep(real_images), prep(fake_images))
