"""Validate externally-acquired data against docs/DATA.md's specs.

These tests SKIP when the asset is absent (the zero-egress build env has
none of them) and verify the documented checksums / structural
invariants when a user has dropped the files in place — so "file present
but wrong bytes" fails loudly instead of producing silent nonsense.
"""
import glob
import gzip
import hashlib
import json
import os
import struct

import numpy as np
import pytest

REPO = os.path.join(os.path.dirname(__file__), "..")

MNIST_MD5 = {  # torchvision's pinned md5s (docs/DATA.md)
    "train-images-idx3-ubyte.gz": "f68b3c2dcbeaaa9fbdd348bbdeb94873",
    "train-labels-idx1-ubyte.gz": "d53e105ee54ea40749a09fcbcd1e9432",
    "t10k-images-idx3-ubyte.gz": "9fb629c4189551a2d022fa330f9573f3",
    "t10k-labels-idx1-ubyte.gz": "ec29112dd5afa0611ce80d1b7f02629c",
}
MNIST_IDX = {  # magic, counts
    "train-images-idx3-ubyte": (2051, 60000),
    "train-labels-idx1-ubyte": (2049, 60000),
    "t10k-images-idx3-ubyte": (2051, 10000),
    "t10k-labels-idx1-ubyte": (2049, 10000),
}


def _find_mnist_dir():
    for base in [os.environ.get("IDDIFF_DATA", ""), REPO,
                 os.path.join(REPO, "data")]:
        if not base:
            continue
        for sub in ["", "MNIST/raw", "mnist"]:
            d = os.path.join(base, sub)
            if glob.glob(os.path.join(d, "train-images-idx3-ubyte*")):
                return d
    return None


def test_mnist_files_match_spec():
    d = _find_mnist_dir()
    if d is None:
        pytest.skip("MNIST not present (see docs/DATA.md)")
    for gzname, md5 in MNIST_MD5.items():
        p = os.path.join(d, gzname)
        if os.path.exists(p):
            with open(p, "rb") as f:
                assert hashlib.md5(f.read()).hexdigest() == md5, gzname
    # structural IDX invariants on whichever form is present
    for stem, (magic, count) in MNIST_IDX.items():
        for cand in (os.path.join(d, stem), os.path.join(d, stem + ".gz")):
            if not os.path.exists(cand):
                continue
            op = gzip.open if cand.endswith(".gz") else open
            with op(cand, "rb") as f:
                m, n = struct.unpack(">II", f.read(8))
            assert (m, n) == (magic, count), cand


def test_mnist_loader_reads_spec_files():
    d = _find_mnist_dir()
    if d is None:
        pytest.skip("MNIST not present (see docs/DATA.md)")
    from iddiff.data.image import load_mnist

    imgs, labels = load_mnist(os.path.dirname(d) or d)
    assert imgs.shape[1:] == (28, 28)
    assert imgs.shape[0] == labels.shape[0] == 60000


def test_mammoth_json_matches_spec():
    path = os.path.join(REPO, "mammoth.json")
    if not os.path.exists(path):
        pytest.skip("mammoth.json not present (see docs/DATA.md)")
    with open(path) as f:
        pts = json.load(f)
    assert isinstance(pts, list) and len(pts) in (10000, 50000)
    arr = np.asarray(pts, dtype=np.float64)
    assert arr.shape == (len(pts), 3)
    assert np.isfinite(arr).all()


def test_gan_assets_match_spec():
    base = os.environ.get("IDDIFF_DATA", os.path.join(REPO, "data"))
    npys = glob.glob(os.path.join(base, "style_gan_horvat", "gan_*d_train.npy"))
    pts = glob.glob(os.path.join(base, "latent_dim_*", "data.pt"))
    if not npys and not pts:
        pytest.skip("GAN manifold assets not present (see docs/DATA.md)")
    for p in npys:
        arr = np.load(p, mmap_mode="r")
        assert arr.ndim >= 2 and arr.shape[0] > 0
    for p in pts:
        import torch

        t = torch.load(p, map_location="cpu")
        assert t.ndim >= 2 and t.shape[0] > 0
