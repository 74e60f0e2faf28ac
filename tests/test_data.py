"""Dataset generator tests: shapes, manifold properties, split determinism."""
import ml_collections
import numpy as np
import pytest

from iddiff.data import create_datamodule, DATAMODULES
from iddiff.data.ksphere import generate_ksphere, sample_sphere
from iddiff.data.line import generate_line
from iddiff.data.mammoth import generate_mammoth
from iddiff.data.synthetic import (
    generate_fixed_squares,
    generate_fixed_gaussians,
    generate_squares,
    generate_gaussian_bubbles,
    bubble_centers,
)


def base_config(**data_kwargs):
    c = ml_collections.ConfigDict()
    c.seed = 42
    c.data = ml_collections.ConfigDict(data_kwargs)
    c.training = ml_collections.ConfigDict({"batch_size": 16, "workers": 0})
    c.validation = ml_collections.ConfigDict({"batch_size": 16, "workers": 0})
    c.eval = ml_collections.ConfigDict({"batch_size": 16, "workers": 0})
    return c


def test_registry_names():
    for name in ["KSphere", "Line", "Mammoth", "Synthetic", "Gan", "image", "paired"]:
        assert name in DATAMODULES


def test_ksphere_on_sphere():
    data = generate_ksphere(
        n_samples=200, n_spheres=1, ambient_dim=100, manifold_dim=10,
        noise_std=0.0, embedding_type="random_isometry",
    )
    assert data.shape == (200, 100)
    norms = np.linalg.norm(data, axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    # isometry: effective rank of the point cloud is manifold_dim+1
    s = np.linalg.svd(data - data.mean(0), compute_uv=False)
    assert s[10] > 1e-3 and s[11] < 1e-4


def test_ksphere_embeddings():
    for emb in ["first", "separating", "along_axis"]:
        data = generate_ksphere(
            n_samples=50, n_spheres=2, ambient_dim=20, manifold_dim=3,
            noise_std=0.0, embedding_type=emb,
        )
        assert data.shape == (100, 20)
        np.testing.assert_allclose(np.linalg.norm(data, axis=1), 1.0, atol=1e-5)


def test_ksphere_angle_std_polar():
    pts = sample_sphere(np.random.default_rng(0), 500, 5, angle_std=0.1)
    assert pts.shape == (500, 6)
    np.testing.assert_allclose(np.linalg.norm(pts, axis=1), 1.0, atol=1e-5)
    # concentrated near the pole (first coordinate ~ cos(small) ~ 1)
    assert pts[:, 0].mean() > 0.9


def test_line_dataset():
    data = generate_line(ambient_dim=100, n_samples=100)
    assert data.shape == (100, 100)
    # first coordinate is sin(t), t in [0,1]
    assert np.all(data[:, 0] >= 0) and np.all(data[:, 0] <= np.sin(1) + 1e-6)


def test_mammoth_surrogate():
    data = generate_mammoth(ambient_dim=100, embedding_type="random_isometry")
    assert data.shape[1] == 100
    # centered and range-normalized before embedding
    assert abs(data.mean()) < 0.1


def test_fixed_squares_rank():
    """ID = num_squares: the dataset lies in a K-dim linear subspace."""
    K = 7
    data = generate_fixed_squares(300, K, [3, 5], 32, seed=1).reshape(300, -1)
    s = np.linalg.svd(data - data.mean(0), compute_uv=False)
    # rank == number of linearly independent square masks (== K unless two
    # squares coincide exactly for this seed)
    rank = int((s > s[0] * 1e-5).sum())
    assert rank == K, s[:K + 1]


def test_squares_paint_count():
    data = generate_squares(10, 3, [3], 16, seed=0)
    assert data.shape == (10, 16, 16, 1)
    # each square paints side² pixels (+=1 each, overlaps add)
    np.testing.assert_allclose(data.sum(axis=(1, 2, 3)), 3 * 9)


def test_fixed_gaussians():
    data = generate_fixed_gaussians(20, 5, [1, 5], 16, seed=0)
    assert data.shape == (20, 16, 16, 1)
    np.testing.assert_allclose(data.min(axis=(1, 2, 3)), 0.0, atol=1e-6)
    np.testing.assert_allclose(data.max(axis=(1, 2, 3)), 1.0, atol=1e-6)


def test_gaussian_bubbles_and_score():
    import jax.numpy as jnp
    from iddiff.sde import VESDE

    c = base_config(
        datamodule="Synthetic", dataset_type="GaussianBubbles",
        data_samples=500, mixtures=4, std=0.1, split=[0.8, 0.1, 0.1],
        return_labels=False,
    )
    dm = create_datamodule(c)
    dm.setup()
    assert dm.train_data.shape == (400, 2)
    # analytic score points toward the nearest center at small t
    sde = VESDE(sigma_min=0.01, sigma_max=2.0)
    centers = bubble_centers(4)
    x = jnp.asarray(centers[0][None] * 1.3, dtype=jnp.float32)
    t = jnp.full((1,), 1e-3)
    score = dm.ground_truth_score(x, t, sde)
    # center is at (1,0); x=(1.3,0); score should point in -x direction
    assert float(score[0, 0]) < 0


def test_datamodule_split_and_loader():
    c = base_config(
        datamodule="KSphere", data_samples=100, n_spheres=1, ambient_dim=10,
        manifold_dim=3, noise_std=0.0, embedding_type="first",
        split=[0.8, 0.1, 0.1],
    )
    dm = create_datamodule(c)
    dm.setup()
    assert len(dm.train_data) == 80
    assert len(dm.val_data) == 10
    batches = list(dm.train_dataloader())
    assert batches[0].shape == (16, 10)
    assert sum(len(b) for b in batches) == 80
    # deterministic split across instantiations
    dm2 = create_datamodule(c)
    dm2.setup()
    np.testing.assert_array_equal(dm.train_data, dm2.train_data)


def test_paired_loader_shapes():
    c = base_config(
        datamodule="paired", base_datamodule="Synthetic",
        dataset_type="FixedSquaresManifold", data_samples=64,
        num_squares=4, square_range=[3, 5], image_size=16,
        split=[0.8, 0.1, 0.1], scale=2,
    )
    dm = create_datamodule(c)
    dm.setup()
    lr, hr = next(iter(dm.train_dataloader()))
    assert hr.shape[1:] == (16, 16, 1)
    assert lr.shape[1:] == (8, 8, 1)


def test_generated_dataset_cache(tmp_path):
    """data.cache_generated=True: second setup loads from the npz cache and
    yields identical splits; labels round-trip too."""
    import ml_collections

    from iddiff.data import create_datamodule

    def cfg():
        c = ml_collections.ConfigDict()
        c.seed = 3
        c.data = ml_collections.ConfigDict(dict(
            datamodule="KSphere", manifold_dim=2, ambient_dim=8,
            n_spheres=1, noise_std=0.0, embedding_type="random_isometry",
            data_samples=200, split=[0.8, 0.1, 0.1], return_labels=False,
            cache_generated=True, cache_dir=str(tmp_path),
        ))
        for k in ["training", "validation", "eval"]:
            setattr(c, k, ml_collections.ConfigDict(
                {"batch_size": 16, "workers": 0}))
        return c

    dm1 = create_datamodule(cfg())
    dm1.setup()
    files = list(tmp_path.iterdir())
    assert len(files) == 1 and files[0].suffix == ".npz"
    dm2 = create_datamodule(cfg())
    dm2.setup()  # loads from cache
    np.testing.assert_array_equal(dm1.train_data, dm2.train_data)
    np.testing.assert_array_equal(dm1.test_data, dm2.test_data)
    # a different config hashes to a different cache entry
    c3 = cfg()
    c3.data.manifold_dim = 3
    dm3 = create_datamodule(c3)
    dm3.setup()
    assert len(list(tmp_path.iterdir())) == 2
