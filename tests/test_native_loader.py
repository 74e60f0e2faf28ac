"""C++ prefetching batch loader: build, correctness, determinism, trainer use."""
import numpy as np
import pytest

native = pytest.importorskip("iddiff.native")

if not native.native_available():  # pragma: no cover
    pytest.skip("no C++ toolchain available", allow_module_level=True)


def test_native_loader_covers_dataset():
    data = np.arange(40, dtype=np.float32).reshape(20, 2)
    it = native.NativeEpochIterator(data, batch_size=6, shuffle=True, seed=3)
    batches = list(it)
    assert [b.shape for b in batches] == [(6, 2), (6, 2), (6, 2)]  # drop_last
    seen = np.concatenate(batches)
    # every row is a genuine dataset row
    assert all(any(np.array_equal(r, d) for d in data) for r in seen)
    # no duplicates within the epoch
    assert len(np.unique(seen[:, 0])) == 18


def test_native_loader_reshuffles_and_is_deterministic():
    data = np.arange(64, dtype=np.float32).reshape(32, 2)
    it1 = native.NativeEpochIterator(data, 8, shuffle=True, seed=5)
    e1 = np.concatenate(list(it1))
    e2 = np.concatenate(list(it1))
    assert not np.array_equal(e1, e2)  # different epochs reshuffle
    it2 = native.NativeEpochIterator(data, 8, shuffle=True, seed=5)
    e1b = np.concatenate(list(it2))
    np.testing.assert_array_equal(e1, e1b)  # same seed → same stream


def test_native_loader_no_shuffle_order():
    data = np.arange(24, dtype=np.float32).reshape(12, 2)
    it = native.NativeEpochIterator(data, 4, shuffle=False, seed=0)
    batches = list(it)
    np.testing.assert_array_equal(np.concatenate(batches), data)


def test_native_loader_image_shapes():
    data = np.random.default_rng(0).normal(size=(17, 8, 8, 3)).astype(np.float32)
    it = native.NativeEpochIterator(data, 4, shuffle=True, seed=1)
    b = next(iter(it))
    assert b.shape == (4, 8, 8, 3)
    assert len(it) == 4


def test_datamodule_uses_native_loader():
    import ml_collections

    from iddiff.data import create_datamodule

    c = ml_collections.ConfigDict()
    c.seed = 0
    c.data = ml_collections.ConfigDict(dict(
        datamodule="KSphere", data_samples=100, n_spheres=1, ambient_dim=8,
        manifold_dim=2, noise_std=0.0, embedding_type="first",
        split=[0.8, 0.1, 0.1], return_labels=False,
    ))
    for k in ["training", "validation", "eval"]:
        setattr(c, k, ml_collections.ConfigDict({"batch_size": 16, "workers": 0}))
    c.training.native_loader = True
    dm = create_datamodule(c)
    dm.setup()
    loader = dm.train_dataloader()
    from iddiff.native import NativeEpochIterator

    assert isinstance(loader, NativeEpochIterator)
    batches = list(loader)
    assert sum(len(b) for b in batches) == 80
    # same loader object reused (threads persist across epochs)
    assert dm.train_dataloader() is loader


def test_native_loader_per_host_shards():
    """Native loader sharding: disjoint per-host rows, identical batch
    counts, union covers the truncated epoch (multi-host lockstep)."""
    from iddiff.native import NativeEpochIterator, native_available

    if not native_available():
        pytest.skip("no C++ toolchain")
    data = np.arange(101, dtype=np.float32).reshape(101, 1)
    hosts = [
        NativeEpochIterator(data, batch_size=10, shuffle=True, seed=7,
                            drop_last=False, shard_index=i, num_shards=2)
        for i in range(2)
    ]
    rows = [np.concatenate(list(h)).ravel() for h in hosts]
    assert len(rows[0]) == len(rows[1]) == 50  # 101 -> truncated to 100 -> 50
    s0, s1 = set(rows[0].tolist()), set(rows[1].tolist())
    assert not (s0 & s1)
    assert len(s0 | s1) == 100
    # same seed => same global permutation: re-iterating gives a NEW epoch
    rows2 = np.concatenate(list(hosts[0])).ravel()
    assert set(rows2.tolist()) & s1 != set()  # epochs reshuffle across shards
