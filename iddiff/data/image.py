"""Real image datasets: MNIST (padded 28→32) and folder-of-images (celebA-style).

Rebuild of /root/reference/lightning_data_modules/ImageDatasets.py:10-97.
Differences forced by the TPU environment (zero egress, no torchvision):
MNIST is read from raw IDX or .npz files under config.data.base_dir; the
celebA-style pipeline (center-crop 108 of 178×218, bicubic resize,
normalize to [-1, 1]) is done once at setup with vectorized numpy +
jax.image.resize.  Output layout is NHWC.
"""
from __future__ import annotations

import glob
import gzip
import os
import struct

import numpy as np

from .datamodule import ArrayDataModule
from .registry import register_datamodule


def _read_idx(path: str) -> np.ndarray:
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        magic = struct.unpack(">I", f.read(4))[0]
        ndim = magic & 0xFF
        shape = struct.unpack(">" + "I" * ndim, f.read(4 * ndim))
        return np.frombuffer(f.read(), dtype=np.uint8).reshape(shape)


def load_mnist(base_dir: str):
    """Load MNIST train images/labels from IDX(.gz) or .npz under base_dir."""
    candidates = [
        ("train-images-idx3-ubyte", "train-labels-idx1-ubyte"),
        ("train-images-idx3-ubyte.gz", "train-labels-idx1-ubyte.gz"),
    ]
    for sub in ["", "MNIST/raw", "mnist"]:
        for imgs, labs in candidates:
            ip = os.path.join(base_dir, sub, imgs)
            lp = os.path.join(base_dir, sub, labs)
            if os.path.exists(ip) and os.path.exists(lp):
                return _read_idx(ip), _read_idx(lp)
    npz = glob.glob(os.path.join(base_dir, "**", "mnist*.npz"), recursive=True)
    if npz:
        with np.load(npz[0]) as z:
            return z["x_train"], z["y_train"]
    raise FileNotFoundError(
        f"MNIST not found under '{base_dir}'. Provide IDX files "
        "(train-images-idx3-ubyte[.gz]) or an mnist.npz "
        "(this environment has no network egress to download it)."
    )


def mnist_arrays(base_dir: str):
    """28×28 → zero-padded 32×32, scaled to [0,1], NHWC (ImageDatasets.py:13)."""
    x, y = load_mnist(base_dir)
    x = x.astype(np.float32) / 255.0
    x = np.pad(x, ((0, 0), (2, 2), (2, 2)))
    return x[..., None], y.astype(np.int32)


def folder_arrays(path: str, res: int, crop: bool):
    """Center-crop (celebA 108 of 178×218) + bicubic resize + [-1,1] normalize
    (ImageDatasets.py:31-58)."""
    from PIL import Image
    import jax
    import jax.numpy as jnp

    files = sorted(
        f for f in glob.glob(os.path.join(path, "*")) if os.path.isfile(f)
    )
    if not files:
        raise FileNotFoundError(f"No images under '{path}'")
    imgs = []
    for f in files:
        arr = np.asarray(Image.open(f).convert("RGB"), dtype=np.float32) / 255.0
        if crop:
            ch = (arr.shape[0] - 108) // 2
            cw = (arr.shape[1] - 108) // 2
            arr = arr[ch: ch + 108, cw: cw + 108]
        imgs.append(arr)
    batch = jnp.asarray(np.stack(imgs))
    batch = jax.image.resize(
        batch, (batch.shape[0], res, res, 3), method="bicubic"
    )
    if crop:
        batch = batch * 2.0 - 1.0
    return np.asarray(batch, dtype=np.float32)


@register_datamodule(name="image")
class ImageDataModule(ArrayDataModule):
    def generate(self, config):
        d = config.data
        if d.dataset == "mnist":
            return mnist_arrays(d.base_dir)
        res = d.shape[0] if len(d.shape) == 3 else d.shape[1]
        return folder_arrays(
            os.path.join(d.base_dir, d.dataset), res, d.get("crop", True)
        )
