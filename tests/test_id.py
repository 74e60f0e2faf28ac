"""ID-estimator tests: Gram-trick equivalence, oracle end-to-end dim, sharding."""
import jax
import jax.numpy as jnp
import ml_collections
import numpy as np
import pytest

from iddiff.id import (
    collect_spectra,
    dim_from_spectrum,
    dims_from_spectra,
    load_spectra,
    num_score_batches,
    save_spectra,
    score_spectrum_fn,
)
from iddiff.models import create_model, get_score_fn
from iddiff.sde import VESDE


def test_num_score_batches_matches_reference_formula():
    # d=100, B=500 (the 10-sphere paper config): 4 batches, 100 extra, K=1600
    nb, extra, total = num_score_batches(100, 500)
    assert (nb, extra, total) == (4, 100, 1600)
    # d=1024, B=128: 36 batches, extra=0, K = 35*128
    nb, extra, total = num_score_batches(1024, 128)
    assert (nb, extra, total) == (36, 0, 4480)


def test_gram_spectrum_equals_direct_svd():
    """sqrt(eigh(centered Gram)) must equal singular values of centered scores."""
    rng = np.random.default_rng(0)
    K, d = 400, 30
    scores = rng.normal(size=(K, d)).astype(np.float32) @ np.diag(
        np.linspace(1, 5, 30)
    ).astype(np.float32)
    centered = scores - scores.mean(0, keepdims=True)
    direct = np.linalg.svd(centered, compute_uv=False)
    gram = centered.T @ centered
    via_gram = np.sqrt(np.clip(np.linalg.eigvalsh(gram), 0, None))[::-1]
    np.testing.assert_allclose(via_gram, direct, rtol=1e-3)


def test_readout_rule_synthetic():
    """A spectrum with an obvious cliff at index d-k reads out dim k."""
    d, k = 50, 7
    s = np.concatenate([np.linspace(100, 50, d - k), np.linspace(1.0, 0.5, k)])
    assert dim_from_spectrum(s) == k


def _oracle_setup(manifold_dim, ambient_dim, sigma_max=4.0, N=1000,
                  embedding_type="random_isometry"):
    config = ml_collections.ConfigDict()
    config.model = ml_collections.ConfigDict({"name": "ksphere_gt_exact"})
    config.data = ml_collections.ConfigDict({
        "manifold_dim": manifold_dim, "ambient_dim": ambient_dim,
        "embedding_type": embedding_type,
    })
    model = create_model(config)
    sde = VESDE(sigma_min=1e-2, sigma_max=sigma_max, N=N)
    params = model.init(
        jax.random.PRNGKey(0), jnp.ones((2, ambient_dim)), jnp.ones((2,))
    )["params"]
    score_fn = get_score_fn(sde, model, params)
    return sde, score_fn


def test_oracle_ksphere_dim_estimate():
    """THE paper pipeline with zero training: k-sphere oracle → dim ≈ k.

    Mirrors SURVEY.md §7 step 2 acceptance: ksphere_gt oracle reproduces the
    ground-truth dimension without training (KSphereGroundTruthModel path).
    """
    from iddiff.data.ksphere import generate_ksphere

    k, d = 10, 100
    sde, score_fn = _oracle_setup(k, d)
    data = generate_ksphere(
        n_samples=5, n_spheres=1, ambient_dim=d, manifold_dim=k,
        noise_std=0.0, embedding_type="random_isometry", seed=3,
    )
    x = jnp.asarray(data)
    spectra, K = collect_spectra(
        jax.random.PRNGKey(1), sde, score_fn, x, batch_size=500, t=1e-5
    )
    assert spectra.shape == (5, d)
    assert K == 1600
    dims = dims_from_spectra(np.asarray(spectra))
    # statistical estimator: all points should read out exactly k here
    assert np.median(dims) == k, dims


def test_oracle_dim_other_k():
    from iddiff.data.ksphere import generate_ksphere

    k, d = 3, 40
    sde, score_fn = _oracle_setup(k, d, embedding_type="first")
    data = generate_ksphere(
        n_samples=4, n_spheres=1, ambient_dim=d, manifold_dim=k,
        noise_std=0.0, embedding_type="first", seed=5,
    )
    spectra, _ = collect_spectra(
        jax.random.PRNGKey(2), sde, score_fn, jnp.asarray(data),
        batch_size=200, t=1e-5,
    )
    dims = dims_from_spectra(np.asarray(spectra))
    assert np.median(dims) == k, dims


def test_collect_spectra_sharded_over_mesh():
    """Same estimates on an 8-device 'data' mesh (fake cluster)."""
    from jax.sharding import Mesh
    from iddiff.data.ksphere import generate_ksphere

    k, d = 5, 32
    sde, score_fn = _oracle_setup(k, d, embedding_type="first")
    data = generate_ksphere(
        n_samples=8, n_spheres=1, ambient_dim=d, manifold_dim=k,
        noise_std=0.0, embedding_type="first", seed=7,
    )
    devices = np.array(jax.devices()[:8])
    mesh = Mesh(devices, ("data",))
    spectra, _ = collect_spectra(
        jax.random.PRNGKey(3), sde, score_fn, jnp.asarray(data),
        batch_size=128, t=1e-5, mesh=mesh,
    )
    dims = dims_from_spectra(np.asarray(spectra))
    assert np.median(dims) == k, dims


def test_spectra_pickle_roundtrip(tmp_path):
    spectra = np.random.default_rng(0).normal(size=(3, 20)) ** 2
    spectra = -np.sort(-spectra, axis=1)
    path = save_spectra(spectra, str(tmp_path / "svd"), name="test")
    loaded = load_spectra(path)
    assert len(loaded) == 3
    np.testing.assert_allclose(loaded, spectra, rtol=1e-6)
    # format identical to the reference: dict with 'singular_values' lists
    import pickle

    with open(path, "rb") as f:
        raw = pickle.load(f)
    assert set(raw.keys()) == {"singular_values"}
    assert isinstance(raw["singular_values"][0], list)


def test_conditional_manifold_dimension_artifacts(tmp_path):
    """12 t-slices of per-class spectra in the reference's pickle layout
    (dim_reduction.py:12-114)."""
    import os
    import pickle

    import ml_collections

    from iddiff import run_lib

    c = ml_collections.ConfigDict()
    c.seed = 0
    c.logging = ml_collections.ConfigDict(
        {"log_path": str(tmp_path), "log_name": "cond",
         "top_k": 1, "every_n_epochs": None, "envery_timedelta": None}
    )
    c.training = ml_collections.ConfigDict(dict(
        batch_size=32, sde="vesde", continuous=True, workers=0,
        lightning_module="ksphere_gt",
    ))
    c.validation = ml_collections.ConfigDict({"batch_size": 32, "workers": 0})
    c.eval = ml_collections.ConfigDict({"batch_size": 32, "workers": 0})
    c.data = ml_collections.ConfigDict(dict(
        datamodule="Synthetic", dataset_type="GaussianBubbles",
        data_samples=400, mixtures=2, std=0.1, split=[0.5, 0.4, 0.1],
        return_labels=True, use_data_mean=False, manifold_dim=1,
        ambient_dim=2, embedding_type="first",
    ))
    c.model = ml_collections.ConfigDict(dict(
        name="ksphere_gt_exact", checkpoint_path=None, sigma_max=2.0,
        sigma_min=1e-2, num_scales=100, ema_rate=0.999,
    ))
    c.dim_estimation = ml_collections.ConfigDict({"num_datapoints": 3})

    run_lib.get_conditional_manifold_dimension(c)
    svd_root = tmp_path / "cond" / "svd"
    slices = sorted(os.listdir(svd_root))
    assert len(slices) == 12
    for s in slices[:2]:
        with open(svd_root / s / "labels_svd.pkl", "rb") as f:
            info = pickle.load(f)
        assert len(info["singular_values"]) == 3
        assert len(info["singular_values"][0]) == 2  # d = 2
        with open(svd_root / s / "labels.pkl", "rb") as f:
            assert pickle.load(f)["labels"] == [1, 1, 1]


def test_manifold_dimension_chunked_padding(tmp_path):
    """run_lib chunking: P=5 with chunk=2 (ragged tail pad) reproduces dim k."""
    import ml_collections

    from iddiff import run_lib

    k, d = 4, 24
    c = ml_collections.ConfigDict()
    c.seed = 0
    c.logging = ml_collections.ConfigDict(
        {"log_path": str(tmp_path), "log_name": "chunk", "svd_points": 5,
         "top_k": 1, "every_n_epochs": None, "envery_timedelta": None}
    )
    c.training = ml_collections.ConfigDict(dict(
        batch_size=64, sde="vesde", continuous=True, workers=0,
        lightning_module="ksphere_gt",
    ))
    c.validation = ml_collections.ConfigDict({"batch_size": 64, "workers": 0})
    c.eval = ml_collections.ConfigDict({"batch_size": 64, "workers": 0})
    c.data = ml_collections.ConfigDict(dict(
        datamodule="KSphere", data_samples=200, n_spheres=1, ambient_dim=d,
        manifold_dim=k, noise_std=0.0, embedding_type="first",
        split=[0.8, 0.1, 0.1], return_labels=False, use_data_mean=False,
    ))
    c.model = ml_collections.ConfigDict(dict(
        name="ksphere_gt_exact", checkpoint_path=None, sigma_max=2.0,
        sigma_min=1e-2, num_scales=100, ema_rate=0.999,
    ))
    c.dim_estimation = ml_collections.ConfigDict(
        {"num_datapoints": 5, "points_per_chunk": 2}
    )
    dims = run_lib.get_manifold_dimension(c)
    assert len(dims) == 5
    assert int(np.median(dims)) == k, dims


def test_compute_batch_size_same_K_same_dims():
    """compute_batch_size re-batches the SAME K samples: K matches the
    reference formula exactly and the oracle still reads exact k."""
    from iddiff.data.ksphere import generate_ksphere
    from iddiff.id import make_spectra_fn

    k, d = 4, 36
    config = ml_collections.ConfigDict()
    config.model = ml_collections.ConfigDict({"name": "ksphere_gt_exact"})
    config.data = ml_collections.ConfigDict({
        "manifold_dim": k, "ambient_dim": d, "embedding_type": "first",
    })
    model = create_model(config)
    sde = VESDE(sigma_min=1e-2, sigma_max=4.0, N=100)
    params = model.init(
        jax.random.PRNGKey(0), jnp.ones((2, d)), jnp.ones((2,))
    )["params"]
    data = jnp.asarray(generate_ksphere(
        n_samples=3, n_spheres=1, ambient_dim=d, manifold_dim=k,
        noise_std=0.0, embedding_type="first", seed=5,
    ))
    fn_a, K_a = make_spectra_fn(sde, model, data_shape=(d,), batch_size=20,
                                t=1e-5)
    fn_b, K_b = make_spectra_fn(sde, model, data_shape=(d,), batch_size=20,
                                t=1e-5, compute_batch_size=64)
    assert K_a == K_b  # the reference K formula is untouched
    dims_a = dims_from_spectra(np.asarray(fn_a(jax.random.PRNGKey(1), params, data)))
    dims_b = dims_from_spectra(np.asarray(fn_b(jax.random.PRNGKey(2), params, data)))
    assert np.median(dims_a) == k
    assert np.median(dims_b) == k


def test_select_datapoints_is_seeded_permutation():
    """VERDICT r2 item 6: estimator datapoints are drawn by seeded
    permutation (reference: shuffled dataloader, dim_reduction.py:154-167),
    not first-n — first-n is biased for sorted file-backed datasets."""
    from iddiff.run_lib import select_datapoints

    data = np.arange(100, dtype=np.float32).reshape(100, 1)
    sel = select_datapoints(data, 10, seed=42)
    assert sel.shape == (10, 1)
    # reproducible
    np.testing.assert_array_equal(sel, select_datapoints(data, 10, seed=42))
    # actually permuted: not the first-n prefix
    assert not np.array_equal(sel[:, 0], np.arange(10, dtype=np.float32))
    # a draw without replacement from the data
    assert len(np.unique(sel)) == 10
    assert np.isin(sel, data).all()
    # different seed, different draw
    assert not np.array_equal(sel, select_datapoints(data, 10, seed=7))


def test_restore_which_selects_cadence(tmp_path):
    """model.restore_which picks best vs last (run_lib._restore_eval_params);
    the reference allows pointing at any .ckpt (dim_reduction.py:127) — with
    directory keepers the selector is the equivalent."""
    import dataclasses

    import ml_collections
    import orbax.checkpoint as ocp

    from iddiff.data import create_datamodule
    from iddiff.models import create_model
    from iddiff.run_lib import _restore_eval_params
    from iddiff.training.checkpoints import CheckpointKeeper
    from iddiff.training.optim import make_optimizer
    from iddiff.training.state import TrainState
    from iddiff.training.trainer import example_init_inputs

    d = 6
    c = ml_collections.ConfigDict()
    c.seed = 0
    c.training = ml_collections.ConfigDict(dict(
        batch_size=16, sde="vesde", continuous=True, workers=0))
    c.validation = ml_collections.ConfigDict({"batch_size": 16, "workers": 0})
    c.eval = ml_collections.ConfigDict({"batch_size": 16, "workers": 0})
    c.data = ml_collections.ConfigDict(dict(
        datamodule="KSphere", data_samples=64, n_spheres=1, ambient_dim=d,
        manifold_dim=2, noise_std=0.0, embedding_type="first",
        split=[0.8, 0.1, 0.1], return_labels=False, use_data_mean=False))
    c.model = ml_collections.ConfigDict(dict(
        name="fcn", state_size=d, hidden_layers=1, hidden_nodes=8,
        dropout=0.0, sigma_max=2.0, sigma_min=1e-2, num_scales=10,
        ema_rate=0.999, checkpoint_path=None))
    c.optim = ml_collections.ConfigDict(dict(
        weight_decay=0.0, optimizer="Adam", lr=1e-3, beta1=0.9, eps=1e-8,
        warmup=0, grad_clip=-1.0))

    dm = create_datamodule(c)
    dm.setup()
    model = create_model(c)
    x, t = example_init_inputs(c, next(iter(dm.train_dataloader())))
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng, "dropout": rng}, x, t)["params"]
    opt = make_optimizer(c)
    state_a = TrainState.create(params, opt.init(params), rng)
    state_b = dataclasses.replace(
        state_a,
        ema_params=jax.tree_util.tree_map(
            lambda v: v + 1.0, state_a.ema_params),
    )

    wd = str(tmp_path / "run")
    keeper = CheckpointKeeper(wd)
    keeper.save_eval(1, state_a, eval_loss=0.5)       # best AND last @1
    keeper.last_mgr.save(2, args=ocp.args.StandardSave(state_b))  # last @2
    keeper.wait()

    got_best = _restore_eval_params(c, model, dm, wd)
    c.model.restore_which = "last"
    got_last = _restore_eval_params(c, model, dm, wd)

    leaf_a = jax.tree_util.tree_leaves(state_a.ema_params)[0]
    leaf_best = jax.tree_util.tree_leaves(got_best)[0]
    leaf_last = jax.tree_util.tree_leaves(got_last)[0]
    np.testing.assert_allclose(np.asarray(leaf_best), np.asarray(leaf_a))
    np.testing.assert_allclose(np.asarray(leaf_last),
                               np.asarray(leaf_a) + 1.0)


def test_readout_log_gap_synthetic():
    """Straggler scenario (RESULTS.md "The +1 is the read-out"): bulk at
    ~3500, one weak-normal straggler at 1500, k true-tangent values ~50.
    The reference absolute-difference rule cuts at the bulk edge (k+1);
    the scale-invariant log_gap rule cuts after the straggler (k)."""
    d, k = 64, 10
    s = np.concatenate([
        np.linspace(3700, 3500, d - k - 1), [1500.0],
        np.linspace(55, 35, k),
    ])
    assert dim_from_spectrum(s, rule="reference") == k + 1
    assert dim_from_spectrum(s, rule="log_gap") == k
    # on a clean cliff both rules agree
    clean = np.concatenate([np.linspace(100, 50, d - k), np.linspace(1.0, 0.5, k)])
    assert dim_from_spectrum(clean, rule="reference") == k
    assert dim_from_spectrum(clean, rule="log_gap") == k
    # tail knob applies to either rule (plot_utils.py:178-180)
    assert dim_from_spectrum(s, rule="reference", tail=k) <= k


@pytest.mark.parametrize("art,ref_median,lg_median", [
    ("artifacts/squares10_trajectory/estimate50_steps_328125.pkl", 11, 10),
    ("artifacts/blobs10_trajectory/estimate50_steps_120000.pkl", 11, 10),
    ("artifacts/ksphere50_tpu_svd.pkl", 50, 50),
    ("artifacts/line_tpu_svd.pkl", 2, 1),
])
def test_readout_rules_on_archived_spectra(art, ref_median, lg_median):
    """Regression-pin the measured read-outs on the archived paper-model
    spectra: reference rule reads truth+1 on the image manifolds and line,
    log_gap reads the exact truth (10 / 10 / 50 / 1)."""
    import os
    import pickle

    path = os.path.join(os.path.dirname(__file__), "..", art)
    if not os.path.exists(path):
        pytest.skip(f"{art} not present")
    with open(path, "rb") as f:
        sv = np.asarray(pickle.load(f)["singular_values"])
    assert np.median(dims_from_spectra(sv, rule="reference")) == ref_median
    assert np.median(dims_from_spectra(sv, rule="log_gap")) == lg_median
