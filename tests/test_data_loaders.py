"""File-backed data loaders: MNIST IDX parsing, GAN manifolds, pkl SR crops."""
import gzip
import os
import pickle
import struct

import ml_collections
import numpy as np
import pytest

from iddiff.data import create_datamodule
from iddiff.data.image import _read_idx, load_mnist, mnist_arrays


def _write_idx_images(path, images):
    n, h, w = images.shape
    with open(path, "wb") as f:
        f.write(struct.pack(">I", 0x00000803))
        f.write(struct.pack(">III", n, h, w))
        f.write(images.astype(np.uint8).tobytes())


def _write_idx_labels(path, labels):
    with open(path, "wb") as f:
        f.write(struct.pack(">I", 0x00000801))
        f.write(struct.pack(">I", len(labels)))
        f.write(labels.astype(np.uint8).tobytes())


def test_mnist_idx_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, size=(20, 28, 28)).astype(np.uint8)
    labels = rng.integers(0, 10, size=20).astype(np.uint8)
    _write_idx_images(tmp_path / "train-images-idx3-ubyte", imgs)
    _write_idx_labels(tmp_path / "train-labels-idx1-ubyte", labels)

    x, y = load_mnist(str(tmp_path))
    np.testing.assert_array_equal(x, imgs)
    np.testing.assert_array_equal(y, labels)

    # padded 28->32, [0,1], NHWC (ImageDatasets.py:13 semantics)
    ax, ay = mnist_arrays(str(tmp_path))
    assert ax.shape == (20, 32, 32, 1)
    assert ax.max() <= 1.0 and ax.min() >= 0.0
    np.testing.assert_allclose(ax[:, :2].sum(), 0.0)  # zero padding


def test_mnist_gz_variant(tmp_path):
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 256, size=(4, 28, 28)).astype(np.uint8)
    labels = rng.integers(0, 10, size=4).astype(np.uint8)
    raw_i, raw_l = tmp_path / "i.tmp", tmp_path / "l.tmp"
    _write_idx_images(raw_i, imgs)
    _write_idx_labels(raw_l, labels)
    with open(raw_i, "rb") as f, gzip.open(
        tmp_path / "train-images-idx3-ubyte.gz", "wb"
    ) as g:
        g.write(f.read())
    with open(raw_l, "rb") as f, gzip.open(
        tmp_path / "train-labels-idx1-ubyte.gz", "wb"
    ) as g:
        g.write(f.read())
    os.remove(raw_i)
    os.remove(raw_l)
    x, y = load_mnist(str(tmp_path))
    np.testing.assert_array_equal(x, imgs)


def test_gan_datamodule_npy(tmp_path):
    arr = np.random.default_rng(2).normal(size=(40, 3, 16, 16)).astype(np.float32)
    d = tmp_path / "style_gan_horvat"
    d.mkdir()
    np.save(d / "gan_7d_train.npy", arr)

    c = ml_collections.ConfigDict()
    c.seed = 0
    c.data = ml_collections.ConfigDict(dict(
        datamodule="Gan", data_path=str(tmp_path), style_gan=True,
        latent_dim=7, split=[0.5, 0.25, 0.25], return_labels=False,
    ))
    for k in ["training", "validation", "eval"]:
        setattr(c, k, ml_collections.ConfigDict({"batch_size": 4, "workers": 0}))
    dm = create_datamodule(c)
    dm.setup()
    assert dm.train_data.shape == (20, 16, 16, 3)  # NCHW -> NHWC


def test_lrhr_pkl_datamodule(tmp_path):
    crops = np.random.default_rng(3).uniform(size=(24, 16, 16, 3)).astype(
        np.float32
    )
    with open(tmp_path / "hr.pkl", "wb") as f:
        pickle.dump(crops, f)

    c = ml_collections.ConfigDict()
    c.seed = 0
    c.data = ml_collections.ConfigDict(dict(
        datamodule="LRHR_PKL", hr_path=str(tmp_path / "hr.pkl"), scale=2,
        split=[0.5, 0.25, 0.25], return_labels=False,
    ))
    for k in ["training", "validation", "eval"]:
        setattr(c, k, ml_collections.ConfigDict({"batch_size": 4, "workers": 0}))
    dm = create_datamodule(c)
    dm.setup()
    lr, hr = next(iter(dm.train_dataloader()))
    assert hr.shape == (4, 16, 16, 3)
    assert lr.shape == (4, 8, 8, 3)


def test_conditional_1d_synthetic():
    c = ml_collections.ConfigDict()
    c.seed = 0
    c.data = ml_collections.ConfigDict(dict(
        datamodule="Conditional1DSynthetic", data_samples=64,
        noise_std=0.01, split=[0.5, 0.25, 0.25], return_labels=False,
    ))
    for k in ["training", "validation", "eval"]:
        setattr(c, k, ml_collections.ConfigDict({"batch_size": 8, "workers": 0}))
    dm = create_datamodule(c)
    dm.setup()
    y, x = next(iter(dm.train_dataloader()))
    assert y.shape == (8,)
    assert x.shape == (8, 1)
    # the two branches: |x| ≈ |sin(pi y)|
    np.testing.assert_allclose(
        np.abs(x[:, 0]), np.abs(np.sin(np.pi * y)), atol=0.05
    )


def _pkl_config(tmp_path, name, **data_kw):
    crops = (np.random.default_rng(5).uniform(size=(24, 16, 16, 3)) * 255
             ).astype(np.float32)
    with open(tmp_path / "hr.pklv4", "wb") as f:
        pickle.dump(list(crops), f)  # the SRFLOW pickles are lists of HWC
    c = ml_collections.ConfigDict()
    c.seed = 0
    c.data = ml_collections.ConfigDict(dict(
        datamodule=name, hr_path=str(tmp_path / "hr.pklv4"),
        split=[0.5, 0.25, 0.25], return_labels=False, **data_kw,
    ))
    for k in ["training", "validation", "eval"]:
        setattr(c, k, ml_collections.ConfigDict({"batch_size": 4, "workers": 0}))
    return c


def test_haar_pkl_datamodule(tmp_path):
    """Haar_PKL (SRFLOWDataset.py:183-258): all three mappings."""
    c = _pkl_config(tmp_path, "Haar_PKL", level=0, scale=2,
                    map="approx to detail")
    dm = create_datamodule(c)
    dm.setup()
    approx, detail = next(iter(dm.train_dataloader()))
    assert approx.shape == (4, 8, 8, 3)
    assert detail.shape == (4, 8, 8, 9)

    c.data.map = "bicubic to approx"
    dm = create_datamodule(c)
    dm.setup()
    lr, approx = next(iter(dm.train_dataloader()))
    assert lr.shape == (4, 8, 8, 3) and approx.shape == (4, 8, 8, 3)

    c.data.map = "bicubic to haar"
    dm = create_datamodule(c)
    dm.setup()
    lr, haar = next(iter(dm.train_dataloader()))
    assert haar.shape == (4, 8, 8, 12)

    # values normalized to [0,1] from the uint8-range pickle
    assert 0.0 <= lr.min() and lr.max() <= 1.0 + 1e-6


def test_general_pkl_datamodule_tasks(tmp_path):
    """General_PKL (SRFLOWDataset.py:261-330): SR / colorization / inpainting."""
    c = _pkl_config(tmp_path, "General_PKL", image_size=16, scale=2,
                    task="super-resolution", mask_coverage=0.25)
    dm = create_datamodule(c)
    dm.setup()
    lr_nn, hr = next(iter(dm.train_dataloader()))
    assert lr_nn.shape == hr.shape == (4, 16, 16, 3)
    # nearest-upscaled from half res: 2x2 blocks are constant
    assert np.allclose(lr_nn[:, ::2, ::2], lr_nn[:, 1::2, ::2])

    c.data.task = "colorization"
    dm = create_datamodule(c)
    dm.setup()
    gray, hr = next(iter(dm.train_dataloader()))
    assert gray.shape == (4, 16, 16, 1)

    c.data.task = "inpainting"
    dm = create_datamodule(c)
    dm.setup()
    masked, hr = next(iter(dm.train_dataloader()))
    assert masked.shape == hr.shape
    # each image has a zeroed square of ~mask_coverage area
    n_zero = (masked == 0).reshape(4, -1).sum(axis=1)
    assert (n_zero >= 0.8 * 0.25 * 16 * 16 * 3).all()


def test_unpaired_pkl_datamodule(tmp_path):
    c = _pkl_config(tmp_path, "unpaired_PKL", image_size=8)
    dm = create_datamodule(c)
    dm.setup()
    batch = next(iter(dm.train_dataloader()))
    assert batch.shape == (4, 8, 8, 3)  # resized to image_size


def test_pkl_reference_registry_aliases():
    from iddiff.data.registry import DATAMODULES

    for name in ["LRHR_PKLDataset", "Haar_PKLDataset", "General_PKLDataset",
                 "unpaired_PKLDataset"]:
        assert name in DATAMODULES


def test_resolve_pkl_path_reference_mapping(tmp_path):
    """get_exact_paths parity (SRFLOWDataset.py:16-48)."""
    from iddiff.data.paired import resolve_pkl_path

    c = ml_collections.ConfigDict()
    c.data = ml_collections.ConfigDict(dict(base_dir="/data", dataset="DF2K"))
    assert resolve_pkl_path(c, "train", "GT") == "/data/DF2K/DF2K-tr.pklv4"
    assert resolve_pkl_path(c, "val", "LQ") == "/data/DF2K/DIV2K-va_X4.pklv4"
    c.data.dataset = "celeba"
    assert resolve_pkl_path(c, "test", "GT").endswith(
        "CelebAHq_160_MBic_va.pklv4")
    # explicit path wins
    c.data.hr_path = str(tmp_path / "x.pkl")
    assert resolve_pkl_path(c) == str(tmp_path / "x.pkl")
    # unknown dataset without explicit path -> clear error
    c2 = ml_collections.ConfigDict()
    c2.data = ml_collections.ConfigDict(dict(dataset="nope"))
    with pytest.raises(NotImplementedError):
        resolve_pkl_path(c2)
