"""Haar-pyramid datasets: offline builder + level-wise datamodule.

Rebuild of /root/reference/create_dataset.py:52-168 (offline Haar pyramid
builder writing per-level arrays with a train/val/test split dict) and
lightning_data_modules/HaarDecomposedDataset.py:42-70 (reads a chosen
level).  The reference stores level 0 as PNGs and deeper levels as .npy;
here every level is a single .npy per split (images are float32 NHWC,
Haar coefficients subband-major).
"""
from __future__ import annotations

import os
from pathlib import Path

import numpy as np

from .datamodule import ArrayDataModule
from .registry import register_datamodule, get_datamodule


def create_haar_dataset(config, base_data: np.ndarray | None = None) -> str:
    """Build <target_dir>/level_{k}/{train,val,test}.npy pyramids.

    base_data: (N, H, W, C) images; defaults to generating the base
    datamodule from config.data.base_datamodule.
    """
    import jax.numpy as jnp

    from iddiff.nn.haar import haar_forward

    d = config.data
    target = d.haar_dir
    max_depth = int(d.get("max_haar_depth", 3))
    if base_data is None:
        base = get_datamodule(d.base_datamodule)(config)
        base_data = base.generate(config)
        if isinstance(base_data, tuple):
            base_data = base_data[0]

    n = len(base_data)
    split = list(d.split)
    rng = np.random.default_rng(int(config.get("seed", 42)))
    perm = rng.permutation(n)
    n_train, n_val = int(split[0] * n), int(split[1] * n)
    splits = {
        "train": base_data[perm[:n_train]],
        "val": base_data[perm[n_train: n_train + n_val]],
        "test": base_data[perm[n_train + n_val:]],
    }

    current = splits
    for level in range(max_depth + 1):
        level_dir = Path(target) / f"level_{level}"
        level_dir.mkdir(parents=True, exist_ok=True)
        for name, arr in current.items():
            np.save(level_dir / f"{name}.npy", arr.astype(np.float32))
        if level < max_depth:
            nxt = {}
            for name, arr in current.items():
                h = np.asarray(haar_forward(jnp.asarray(arr)))
                nxt[name] = h[..., : arr.shape[-1]]  # DC band of this level
            current = nxt
    return target


@register_datamodule(name="haar_multiscale")
class HaarDecomposedDataModule(ArrayDataModule):
    """Reads one pyramid level (HaarDecomposedDataset.py:42-70); set
    config.data.level (0 = full resolution DC)."""

    def setup(self, stage=None):
        if self._setup_done:
            return
        d = self.config.data
        level_dir = os.path.join(d.haar_dir, f"level_{int(d.get('level', 0))}")
        if not os.path.isdir(level_dir):
            raise FileNotFoundError(
                f"Haar pyramid level not found at '{level_dir}'. Run "
                "create_haar_dataset / --mode with data.create_dataset=True first."
            )
        self.train_data = np.load(os.path.join(level_dir, "train.npy"))
        self.val_data = np.load(os.path.join(level_dir, "val.npy"))
        self.test_data = np.load(os.path.join(level_dir, "test.npy"))
        self.train_labels = self.val_labels = self.test_labels = None
        self._setup_done = True

    def generate(self, config):  # pragma: no cover - setup() overridden
        raise NotImplementedError
