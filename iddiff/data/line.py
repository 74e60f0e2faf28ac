"""1-D curve dataset: t ↦ (sin((i+1)·t))_{i<ambient_dim}, ID = 1.

Rebuild of /root/reference/lightning_data_modules/LineDataset.py:24-38,
vectorized (the reference loops sample-by-sample and function-by-function).
"""
from __future__ import annotations

import numpy as np

from .datamodule import ArrayDataModule
from .registry import register_datamodule


def generate_line(ambient_dim: int = 100, noise_std: float = 0.0,
                  n_samples: int = 10_000, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    t = rng.uniform(size=(n_samples, 1))
    freqs = np.arange(1, ambient_dim + 1)[None, :]
    data = np.sin(freqs * t)
    if noise_std:
        data = data + noise_std * rng.normal(size=data.shape)
    return data.astype(np.float32)


@register_datamodule(name="Line")
class LineDataModule(ArrayDataModule):
    def generate(self, config):
        return generate_line(
            ambient_dim=config.data.get("ambient_dim", 100),
            noise_std=config.data.get("noise_std", 0.0),
            n_samples=config.data.get("data_samples", 10_000),
            seed=int(config.get("seed", 42)),
        )
