"""k-sphere manifolds with known intrinsic dimension — the paper's core fixture.

Rebuild of /root/reference/lightning_data_modules/KSphereDataset.py:7-135:
n_spheres k-spheres of given radii embedded in R^ambient via one of four
embedding types, with optional non-uniform (polar angle_std) sampling and
additive noise.  Fully vectorized numpy; the random isometry uses a fixed
seed (0) like the reference so the manifold is reproducible across runs.
"""
from __future__ import annotations

import numpy as np

from .datamodule import ArrayDataModule
from .registry import register_datamodule


def sample_sphere(rng: np.random.Generator, n_samples: int, manifold_dim: int,
                  angle_std: float = -1.0) -> np.ndarray:
    """Uniform points on S^manifold_dim ⊂ R^(manifold_dim+1), or a polar
    vMF-like concentration when angle_std > 0
    (KSphereDataset.py:75-94, vectorized)."""
    if angle_std == -1:
        x = rng.normal(size=(n_samples, manifold_dim + 1))
        return x / np.linalg.norm(x, axis=1, keepdims=True)
    # polar: angles ~ N(0, angle_std); x_i = cos(a_i) ∏_{j<i} sin(a_j)
    angles = angle_std * rng.normal(size=(n_samples, manifold_dim))
    sin_cum = np.cumprod(np.sin(angles), axis=1)  # (N, m)
    xs = [np.cos(angles[:, 0])]
    for i in range(1, manifold_dim):
        xs.append(sin_cum[:, i - 1] * np.cos(angles[:, i]))
    xs.append(sin_cum[:, -1])
    return np.stack(xs, axis=1)


def embed(data: np.ndarray, ambient_dim: int, embedding_type: str,
          sphere_index: int, n_spheres: int) -> np.ndarray:
    """Embed (N, m+1) sphere samples into R^ambient (KSphereDataset.py:38-64)."""
    n, width = data.shape
    if embedding_type == "random_isometry":
        g = np.random.default_rng(0)  # fixed seed, as in the reference
        m = g.normal(size=(ambient_dim, width))
        q, _ = np.linalg.qr(m)
        return data @ q.T
    if embedding_type == "first":
        out = np.zeros((n, ambient_dim), dtype=data.dtype)
        out[:, :width] = data
        return out
    if embedding_type == "separating":
        if n_spheres * width > ambient_dim:
            raise RuntimeError(
                "Can't fit that many spheres: need n_spheres*(manifold_dim+1) <= ambient_dim"
            )
        out = np.zeros((n, ambient_dim), dtype=data.dtype)
        off = sphere_index * width
        out[:, off: off + width] = data
        return out
    if embedding_type == "along_axis":
        if (n_spheres - 1) + width > ambient_dim:
            raise RuntimeError("Can't fit that many spheres.")
        out = np.zeros((n, ambient_dim), dtype=data.dtype)
        out[:, sphere_index: sphere_index + width] = data
        return out
    raise RuntimeError(f"Unknown embedding type '{embedding_type}'")


def generate_ksphere(n_samples: int, n_spheres: int, ambient_dim: int,
                     manifold_dim, noise_std: float, embedding_type: str,
                     radii=None, angle_std: float = -1.0,
                     seed: int = 42) -> np.ndarray:
    if not radii:
        radii = [1.0] * n_spheres
    if isinstance(manifold_dim, int):
        manifold_dims = [manifold_dim] * n_spheres
    else:
        manifold_dims = list(manifold_dim)

    rng = np.random.default_rng(seed)
    chunks = []
    for i in range(n_spheres):
        pts = sample_sphere(rng, n_samples, manifold_dims[i], angle_std) * radii[i]
        pts = embed(pts, ambient_dim, embedding_type, i, n_spheres)
        if noise_std:
            pts = pts + noise_std * rng.normal(size=pts.shape)
        chunks.append(pts.astype(np.float32))
    return np.concatenate(chunks, axis=0)


@register_datamodule(name="KSphere")
class KSphereDataModule(ArrayDataModule):
    def generate(self, config):
        d = config.data
        return generate_ksphere(
            n_samples=d.data_samples,
            n_spheres=d.n_spheres,
            ambient_dim=d.ambient_dim,
            manifold_dim=d.manifold_dim,
            noise_std=d.noise_std,
            embedding_type=d.embedding_type,
            radii=list(d.get("radii", [])),
            angle_std=d.get("angle_std", -1.0),
            seed=int(config.get("seed", 42)),
        )
