"""Time-series / external-array datamodules.

Rebuild of /root/reference/lightning_data_modules/SyntheticTimeSeries.py:137,
CryptoDataset.py:71 and DanielDataset.py:29:
  - SyntheticTimeSeries: windows of a synthetic AR/sinusoid mixture split
    into (condition L_1, target L_2) for CSDI-style imputation
  - Crypto: sliding windows of returns from a CSV/npy of prices
  - Daniel: arbitrary .npy arrays ('General_PKLDataset'-style external data)
"""
from __future__ import annotations

import os

import numpy as np

from .datamodule import ArrayDataModule, EpochIterator
from .registry import register_datamodule


def generate_synthetic_series(n_samples: int, length: int, n_features: int,
                              seed: int) -> np.ndarray:
    """Mixture of random-phase sinusoids + AR(1) noise, (N, L, K)."""
    rng = np.random.default_rng(seed)
    t = np.arange(length)[None, :, None]
    freq = rng.uniform(0.05, 0.3, size=(n_samples, 1, n_features))
    phase = rng.uniform(0, 2 * np.pi, size=(n_samples, 1, n_features))
    amp = rng.uniform(0.5, 1.5, size=(n_samples, 1, n_features))
    x = amp * np.sin(2 * np.pi * freq * t + phase)
    noise = rng.normal(size=x.shape) * 0.05
    for i in range(1, length):
        noise[:, i] += 0.8 * noise[:, i - 1]
    return (x + noise).astype(np.float32)


class _WindowedSeriesModule(ArrayDataModule):
    """Yields CSDI batches: ({'x': target, 'y': {'input', 'timesteps'}})
    flattened to (y_cond, x_target) tuples for the conditional losses."""

    def _loader(self, data, labels, batch, shuffle, seed, drop_last=False):
        L_1 = int(self.config.data.L_1)
        cond = data[:, :L_1]
        target = data[:, L_1:]
        return EpochIterator((cond, target), batch, shuffle=shuffle,
                             shard_index=self.shard_index,
                             num_shards=self.num_shards,
                             seed=seed, drop_last=drop_last)


@register_datamodule(name="SyntheticTimeSeries")
class SyntheticTimeSeriesDataModule(_WindowedSeriesModule):
    def generate(self, config):
        d = config.data
        return generate_synthetic_series(
            d.data_samples, d.L_1 + d.L_2, d.get("n_features", 1),
            int(config.get("seed", 42)),
        )


@register_datamodule(name="Crypto")
class CryptoDataModule(_WindowedSeriesModule):
    """Sliding log-return windows from a price series file (CryptoDataset.py)."""

    def generate(self, config):
        d = config.data
        path = d.data_path
        if path.endswith(".npy"):
            prices = np.load(path).astype(np.float64)
        else:
            prices = np.loadtxt(path, delimiter=",", skiprows=1, usecols=(1,))
        returns = np.diff(np.log(prices))
        L = d.L_1 + d.L_2
        n = len(returns) - L + 1
        windows = np.stack([returns[i: i + L] for i in range(n)])
        return windows[..., None].astype(np.float32)


@register_datamodule(name="Daniel")
class DanielDataModule(ArrayDataModule):
    """Arbitrary external .npy arrays (DanielDataset.py:29)."""

    def generate(self, config):
        arr = np.load(config.data.data_path)
        return np.asarray(arr, dtype=np.float32)
