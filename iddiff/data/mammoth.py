"""Mammoth 3-D point cloud (ID = 2), optionally embedded in R^ambient.

Rebuild of /root/reference/lightning_data_modules/MammothDataset.py:8-55.
The reference hard-codes reading `mammoth.json` from the CWD and does not
ship the file; here the path is configurable (config.data.mammoth_path) and
when the file is absent we synthesize a surrogate closed 2-manifold
(a torus point cloud) with the same centering/normalization so every
downstream pipeline — including ID estimation with ground truth 2 — remains
exercisable.
"""
from __future__ import annotations

import json
import os

import numpy as np

from .datamodule import ArrayDataModule
from .ksphere import embed
from .registry import register_datamodule


def _surrogate_mammoth(n_samples: int = 50_000, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    u = rng.uniform(0, 2 * np.pi, size=n_samples)
    v = rng.uniform(0, 2 * np.pi, size=n_samples)
    R, r = 1.0, 0.35
    x = (R + r * np.cos(v)) * np.cos(u)
    y = (R + r * np.cos(v)) * np.sin(u)
    z = r * np.sin(v)
    return np.stack([x, y, z], axis=1)


def generate_mammoth(ambient_dim: int = 3, noise_std: float = 0.0,
                     embedding_type: str = "first",
                     mammoth_path: str | None = None,
                     seed: int = 42) -> np.ndarray:
    path = mammoth_path or os.path.join(os.getcwd(), "mammoth.json")
    if os.path.exists(path):
        with open(path, "rb") as f:
            pts = np.asarray(json.load(f), dtype=np.float64)
    else:
        pts = _surrogate_mammoth()
    pts = pts - pts.mean(0)
    pts = pts / (pts.max() - pts.min())
    pts = embed(pts, ambient_dim, embedding_type, sphere_index=0, n_spheres=1)
    if noise_std:
        pts = pts + noise_std * np.random.default_rng(seed).normal(size=pts.shape)
    return pts.astype(np.float32)


@register_datamodule(name="Mammoth")
class MammothDataModule(ArrayDataModule):
    def generate(self, config):
        return generate_mammoth(
            ambient_dim=config.data.get("ambient_dim", 3),
            noise_std=config.data.get("noise_std", 0.0),
            embedding_type=config.data.get("embedding_type", "first"),
            mammoth_path=config.data.get("mammoth_path", None),
            seed=int(config.get("seed", 42)),
        )
