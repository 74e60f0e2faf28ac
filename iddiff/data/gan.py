"""Pre-generated GAN image manifolds of known latent dimension (ID = latent_dim).

Rebuild of /root/reference/lightning_data_modules/GanDataset.py:9-29: loads
`style_gan_horvat/gan_{d}d_train.npy` or `latent_dim_{d}/data.pt` from
config.data.data_path.  Arrays are converted to NHWC float32.
"""
from __future__ import annotations

import os

import numpy as np

from .datamodule import ArrayDataModule
from .registry import register_datamodule


def _to_nhwc(arr: np.ndarray) -> np.ndarray:
    arr = np.asarray(arr, dtype=np.float32)
    if arr.ndim == 4 and arr.shape[1] in (1, 3) and arr.shape[-1] not in (1, 3):
        arr = np.transpose(arr, (0, 2, 3, 1))  # NCHW -> NHWC
    return arr


@register_datamodule(name="Gan")
class GanDataModule(ArrayDataModule):
    def generate(self, config):
        d = config.data
        latent_dim = d.latent_dim
        if d.get("style_gan", False):
            path = os.path.join(
                d.data_path, f"style_gan_horvat/gan_{latent_dim}d_train.npy"
            )
            return _to_nhwc(np.load(path))
        path = os.path.join(d.data_path, f"latent_dim_{latent_dim}/data.pt")
        import torch  # host-side IO only; never in the compute path

        return _to_nhwc(torch.load(path, map_location="cpu").numpy())
