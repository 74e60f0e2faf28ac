"""Paired (LR, HR) super-resolution style datamodules.

Covers the reference's SR data capabilities
(/root/reference/lightning_data_modules/PairedDataset.py:105,
SRDataset.py:66 'bicubic_multiscale', SyntheticPairedDataset.py:78): pairs
are produced by bicubic-downsampling a base image dataset by
config.data.scale, yielding batches (y=LR, x=HR).  The SRFLOW pickle loaders
(SRFLOWDataset.py) are storage adapters; `General_PKLDataset` style inputs
can be pointed at via config.data.hr_path (a .npy/.npz of HR crops).
"""
from __future__ import annotations

import os

import numpy as np

from .datamodule import ArrayDataModule, EpochIterator
from .registry import register_datamodule, get_datamodule


def bicubic_downsample(batch: np.ndarray, scale: int) -> np.ndarray:
    import jax
    import jax.numpy as jnp

    n, h, w, c = batch.shape
    out = jax.image.resize(
        jnp.asarray(batch), (n, h // scale, w // scale, c), method="bicubic"
    )
    return np.asarray(out, dtype=np.float32)


class _PairedMixin:
    """Override loaders to yield (y_LR, x_HR) tuples.

    With data.upsample_lr=True the LR condition is bicubic-upsampled back to
    HR resolution — the SR3 data contract (the reference's SR3 estimator
    concatenates y with x channelwise at equal resolution, ddpm.py:280-285).
    """

    def _pair_loader(self, hr, batch, shuffle, seed):
        scale = int(self.config.data.scale)
        lr = bicubic_downsample(hr, scale)
        if self.config.data.get("upsample_lr", False):
            import jax
            import jax.numpy as jnp

            lr = np.asarray(
                jax.image.resize(jnp.asarray(lr), hr.shape, method="bicubic"),
                dtype=np.float32,
            )
        return EpochIterator((lr, hr), batch, shuffle=shuffle, seed=seed)

    def train_dataloader(self):
        return self._pair_loader(self.train_data, self.train_batch, True, self.seed + 1)

    def val_dataloader(self):
        return self._pair_loader(self.val_data, self.val_batch, True, self.seed + 2)

    def test_dataloader(self):
        return self._pair_loader(self.test_data, self.test_batch, False, self.seed + 3)


@register_datamodule(name="paired")
class PairedDataModule(_PairedMixin, ArrayDataModule):
    """LR/HR pairs from a base datamodule named by config.data.base_datamodule,
    or from an HR array file at config.data.hr_path."""

    def generate(self, config):
        d = config.data
        hr_path = d.get("hr_path", None)
        if hr_path:
            arr = np.load(hr_path)
            if hasattr(arr, "files"):  # npz
                arr = arr[arr.files[0]]
            return np.asarray(arr, dtype=np.float32)
        base = get_datamodule(d.base_datamodule)(config)
        return base.generate(config)


@register_datamodule(name="LRHR_PKL")
class LRHRPKLDataModule(_PairedMixin, ArrayDataModule):
    """SRFLOW-style pickled LR/HR crops (SRFLOWDataset.py:409-493): a pickle
    (or .npz/.npy) of HR crops at config.data.hr_path [+ optional matching
    LR at lr_path; otherwise bicubic-downsampled by data.scale]."""

    def generate(self, config):
        import pickle

        path = config.data.hr_path
        if path.endswith((".pkl", ".pickle")):
            with open(path, "rb") as f:
                arr = pickle.load(f)
            arr = np.asarray(arr, dtype=np.float32)
        else:
            arr = np.load(path)
            if hasattr(arr, "files"):
                arr = arr[arr.files[0]]
            arr = np.asarray(arr, dtype=np.float32)
        if arr.ndim == 4 and arr.shape[1] in (1, 3) and arr.shape[-1] not in (1, 3):
            arr = np.transpose(arr, (0, 2, 3, 1))
        return arr


@register_datamodule(name="bicubic_multiscale")
class BicubicMultiscaleDataModule(_PairedMixin, ArrayDataModule):
    """Bicubic LR/HR pairs at a chosen scale (SRDataset.py:66): identical to
    'paired' but named for the multi-scale test pipeline."""

    def generate(self, config):
        base = get_datamodule(config.data.base_datamodule)(config)
        out = base.generate(config)
        return out[0] if isinstance(out, tuple) else out


@register_datamodule(name="Conditional1DSynthetic")
class Conditional1DSyntheticDataModule(ArrayDataModule):
    """1-D conditional toy data (Synthetic1DConditionalDataset.py:56):
    y ~ U(-1,1) condition, x | y ~ mixture of ±sin branches + noise."""

    def generate(self, config):
        d = config.data
        rng = np.random.default_rng(int(config.get("seed", 42)))
        n = d.data_samples
        y = rng.uniform(-1, 1, size=n).astype(np.float32)
        branch = rng.integers(0, 2, size=n) * 2 - 1
        x = branch * np.sin(np.pi * y) + d.get("noise_std", 0.05) * rng.normal(
            size=n
        )
        return x.astype(np.float32)[:, None], y

    def _loader(self, data, labels, batch, shuffle, seed, drop_last=False):
        return EpochIterator((labels, data), batch, shuffle=shuffle,
                             seed=seed, drop_last=drop_last)


@register_datamodule(name="ConditionalSynthetic")
class ConditionalSyntheticDataModule(ArrayDataModule):
    """(y, x) pairs for conditional Euclidean problems
    (SyntheticPairedDataset.py:78): y = scalar condition, x = point.
    Here: x on a k-sphere, y = its first coordinate + noise."""

    def generate(self, config):
        from .ksphere import generate_ksphere

        d = config.data
        x = generate_ksphere(
            n_samples=d.data_samples, n_spheres=1,
            ambient_dim=d.ambient_dim, manifold_dim=d.manifold_dim,
            noise_std=d.get("noise_std", 0.0),
            embedding_type=d.get("embedding_type", "random_isometry"),
            seed=int(config.get("seed", 42)),
        )
        rng = np.random.default_rng(int(config.get("seed", 42)) + 7)
        y = x[:, 0] + d.get("condition_noise", 0.05) * rng.normal(size=len(x))
        return x, y.astype(np.float32)

    def _loader(self, data, labels, batch, shuffle, seed, drop_last=False):
        # conditional losses expect batch = (y, x)
        return EpochIterator((labels, data), batch, shuffle=shuffle, seed=seed,
                             drop_last=drop_last)
