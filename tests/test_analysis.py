"""Classical ID estimators, PSNR/SSIM, benchmark harness, curl utils."""
import numpy as np
import pytest

from iddiff.analysis import (
    Benchmark,
    batch_psnr,
    batch_ssim,
    local_pca_id,
    mle_id,
    mle_id_bootstrap,
    pca_id,
    psnr,
    ssim,
)
from iddiff.data.ksphere import generate_ksphere


def test_mle_on_ksphere():
    data = generate_ksphere(
        n_samples=2000, n_spheres=1, ambient_dim=20, manifold_dim=5,
        noise_std=0.0, embedding_type="random_isometry", seed=0,
    )
    est = mle_id(data, k=10)
    assert 4.0 < est < 6.5, est


def test_mle_bootstrap():
    data = generate_ksphere(
        n_samples=1000, n_spheres=1, ambient_dim=10, manifold_dim=2,
        noise_std=0.0, embedding_type="first", seed=1,
    )
    mean, std = mle_id_bootstrap(data, k=8, n_bootstrap=5)
    assert 1.5 < mean < 3.0
    assert std < 0.5


def test_pca_id_linear_manifold():
    rng = np.random.default_rng(0)
    latent = rng.normal(size=(500, 4))
    basis = np.linalg.qr(rng.normal(size=(30, 4)))[0]
    data = latent @ basis.T
    assert pca_id(data, var_threshold=0.99) == 4


def test_local_pca_ksphere():
    data = generate_ksphere(
        n_samples=2000, n_spheres=1, ambient_dim=15, manifold_dim=3,
        noise_std=0.0, embedding_type="first", seed=2,
    )
    est = local_pca_id(data, n_neighbors=25)
    assert 2.0 < est < 4.6, est


def test_benchmark_harness_resume(tmp_path):
    csv_path = str(tmp_path / "bench.csv")
    data = {
        "sphere3": generate_ksphere(
            n_samples=400, n_spheres=1, ambient_dim=10, manifold_dim=3,
            noise_std=0.0, embedding_type="first", seed=3,
        )
    }
    b = Benchmark(csv_path, estimators=["mle_5", "pca"])
    b.run(data)
    import csv

    rows = list(csv.DictReader(open(csv_path)))
    assert len(rows) == 2
    # resume: second run adds nothing
    b2 = Benchmark(csv_path, estimators=["mle_5", "pca"])
    b2.run(data)
    rows2 = list(csv.DictReader(open(csv_path)))
    assert len(rows2) == 2


def test_psnr_ssim_basics():
    rng = np.random.default_rng(0)
    img = rng.uniform(size=(32, 32, 1))
    assert psnr(img, img) == float("inf")
    assert abs(ssim(img, img) - 1.0) < 1e-9
    noisy = np.clip(img + 0.05 * rng.normal(size=img.shape), 0, 1)
    p = psnr(img, noisy, data_range=1.0)
    assert 20 < p < 35
    s = ssim(img, noisy, data_range=1.0)
    assert 0.2 < s < 0.999
    assert batch_psnr(img[None], noisy[None], 1.0) == pytest.approx(p)
    assert batch_ssim(img[None], noisy[None], 1.0) == pytest.approx(s)


def test_lpips_gated():
    from iddiff.analysis import lpips_distance

    with pytest.raises(ImportError, match="lpips"):
        lpips_distance(np.zeros((1, 8, 8, 3)), np.zeros((1, 8, 8, 3)))


def test_curl_utils():
    import jax.numpy as jnp
    from iddiff.analysis.vector_fields import curl_autograd, curl_fd

    # rotational field v = (-y, x): curl = 2 everywhere
    field = lambda q: jnp.stack([-q[:, 1], q[:, 0]], axis=1)
    pts = jnp.asarray(np.random.default_rng(0).normal(size=(10, 2)),
                      jnp.float32)
    c = np.asarray(curl_autograd(field, pts))
    np.testing.assert_allclose(c, 2.0, rtol=1e-5)

    n = 50
    xs, ys = np.meshgrid(np.linspace(-1, 1, n), np.linspace(-1, 1, n))
    dx = 2.0 / (n - 1)
    c_fd = curl_fd(-ys, xs, dx)
    np.testing.assert_allclose(c_fd[5:-5, 5:-5], 2.0, rtol=1e-6)


def test_isomap_id_smoke():
    from iddiff.analysis import isomap_id

    data = generate_ksphere(
        n_samples=300, n_spheres=1, ambient_dim=8, manifold_dim=2,
        noise_std=0.0, embedding_type="first", seed=4,
    )
    est = isomap_id(data, max_dim=5)
    assert 1 <= est <= 4


def test_fid_properties():
    from iddiff.analysis.fid import fid, frechet_distance, pixel_fid

    rng = np.random.default_rng(0)
    a = rng.normal(size=(500, 16))
    a2 = rng.normal(size=(500, 16))
    b = rng.normal(loc=2.0, size=(500, 16))
    assert fid(a, a) < 1e-8  # identical sets
    near = fid(a, a2)        # same distribution, sampling noise only
    far = fid(a, b)          # shifted distribution
    assert far > near * 5
    # frechet of identical gaussians is 0
    mu, sig = np.zeros(4), np.eye(4)
    assert abs(frechet_distance(mu, sig, mu, sig)) < 1e-10
    # pixel fid on images
    imgs_a = rng.uniform(size=(100, 8, 8, 1))
    imgs_b = rng.uniform(size=(100, 8, 8, 1)) + 0.5
    assert pixel_fid(imgs_a, imgs_b) > pixel_fid(imgs_a, imgs_a[:50])


def test_ms_ssim_properties():
    """MS-SSIM: 1 for identical images, decreasing with distortion, in [0,1]."""
    from iddiff.analysis.evaluation import batch_ms_ssim, ms_ssim

    rng = np.random.default_rng(0)
    img = rng.uniform(size=(64, 64, 3))
    assert ms_ssim(img, img) == pytest.approx(1.0, abs=1e-6)
    light = np.clip(img + 0.02 * rng.normal(size=img.shape), 0, 1)
    heavy = np.clip(img + 0.5 * rng.normal(size=img.shape), 0, 1)
    s_light, s_heavy = ms_ssim(img, light), ms_ssim(img, heavy)
    assert 0.0 <= s_heavy < s_light <= 1.0
    # batch version + small images fall back to fewer scales w/o error
    small = rng.uniform(size=(2, 16, 16, 1))
    assert 0 <= batch_ms_ssim(small, small) <= 1.0


def test_perceptual_distance_fallback():
    from iddiff.analysis.evaluation import perceptual_distance

    rng = np.random.default_rng(1)
    a = rng.uniform(size=(2, 32, 32, 3))
    out = perceptual_distance(a, a)
    key = next(iter(out))
    assert out[key] == pytest.approx(0.0, abs=1e-6)


def test_plot_helpers_produce_figures():
    """Figure builders (analysis/plots.py) run headless without error and
    return matplotlib figures; extract_sing_vals handles all three modes
    (plot_utils.py:197-205 parity)."""
    import matplotlib

    matplotlib.use("Agg")
    from iddiff.analysis.plots import (
        dims_histogram_figure,
        extract_sing_vals,
        image_grid,
        quiver_figure,
        scatter_figure,
        spectrum_figure,
    )

    rng = np.random.default_rng(0)
    spectra = np.sort(rng.uniform(1, 100, size=(4, 20)))[:, ::-1]
    svd = {"singular_values": [list(map(float, s)) for s in spectra]}
    # modes return a LIST of spectra (plot_utils.py:197-205 semantics)
    assert extract_sing_vals(svd, "first").shape == (1, 20)
    assert extract_sing_vals(svd, "mean").shape == (1, 20)
    assert extract_sing_vals(svd, "all").shape == (4, 20)
    fig = spectrum_figure(spectra, ground_truth=5)
    assert fig.axes, "empty figure"
    assert dims_histogram_figure(spectra).axes
    grid = image_grid(rng.uniform(size=(8, 16, 16, 1)))
    assert grid.ndim == 3 and grid.shape[-1] in (1, 3)
    assert scatter_figure(rng.normal(size=(64, 2)),
                          rng.normal(size=(64, 2))).axes
    pts = rng.normal(size=(25, 2))
    assert quiver_figure(pts, rng.normal(size=(25, 2)), 5).axes


def test_compile_cache_enable(tmp_path, monkeypatch):
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(tmp_path / "cc"))
    from iddiff.utils import enable_compile_cache

    assert enable_compile_cache() is True
    import jax

    assert jax.config.jax_compilation_cache_dir == str(tmp_path / "cc")
    monkeypatch.setenv("IDDIFF_NO_COMPILE_CACHE", "1")
    assert enable_compile_cache() is False
