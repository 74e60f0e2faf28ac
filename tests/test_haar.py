"""Haar DWT, multiscale pipeline, decreasing-variance module, time series."""
import jax
import jax.numpy as jnp
import ml_collections
import numpy as np
import pytest

from iddiff.nn.haar import (
    dc_coefficients,
    haar_backward,
    haar_forward,
    hf_coefficients,
    permute_channels,
)


def test_haar_roundtrip_exact():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3))
    y = haar_forward(x)
    assert y.shape == (2, 8, 8, 12)
    back = haar_backward(y)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-6)


def test_haar_orthonormal():
    """Energy preservation: ‖haar(x)‖ = ‖x‖."""
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 1))
    y = haar_forward(x)
    np.testing.assert_allclose(
        float(jnp.sum(y**2)), float(jnp.sum(x**2)), rtol=1e-6
    )


def test_haar_dc_is_mean():
    """LL band of a constant image = 2·c (orthonormal 2×2 average)."""
    x = jnp.full((1, 4, 4, 1), 3.0)
    dc = dc_coefficients(x)
    np.testing.assert_allclose(np.asarray(dc), 6.0, rtol=1e-6)
    hf = hf_coefficients(x)
    np.testing.assert_allclose(np.asarray(hf), 0.0, atol=1e-6)


def test_permute_channels_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 4, 12))
    p = permute_channels(x, forward=True)
    back = permute_channels(p, forward=False)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_ddpm_multi_speed_haar_forward():
    from iddiff.models import create_model
    from tests.test_image_models import image_config

    config = image_config("ddpm_multi_speed_haar", image_size=16, channels=1)
    model = create_model(config)
    # depth-2 pyramid of a 16x16 single-channel image
    haar_x = {
        "d1": jnp.ones((2, 8, 8, 3)),
        "d2": jnp.ones((2, 4, 4, 3)),
        "a2": jnp.ones((2, 4, 4, 1)),
    }
    t = jnp.full((2,), 10.0)
    params = model.init(jax.random.PRNGKey(0), haar_x, t)["params"]
    out = model.apply({"params": params}, haar_x, t)
    assert set(out.keys()) == {"d1", "d2", "a2"}
    assert out["d1"].shape == (2, 8, 8, 3)
    assert out["a2"].shape == (2, 4, 4, 1)


def test_haar_dataset_builder_and_module(tmp_path):
    from iddiff.data.haar import create_haar_dataset
    from iddiff.data import create_datamodule

    c = ml_collections.ConfigDict()
    c.seed = 42
    c.data = ml_collections.ConfigDict(dict(
        datamodule="haar_multiscale", haar_dir=str(tmp_path / "pyr"),
        base_datamodule="Synthetic", dataset_type="FixedSquaresManifold",
        data_samples=32, num_squares=3, square_range=[3], image_size=16,
        split=[0.5, 0.25, 0.25], max_haar_depth=2, level=1,
        return_labels=False,
    ))
    for k in ["training", "validation", "eval"]:
        setattr(c, k, ml_collections.ConfigDict({"batch_size": 4, "workers": 0}))
    create_haar_dataset(c)
    dm = create_datamodule(c)
    dm.setup()
    # level 1 of a 16px image = 8px DC band
    assert dm.train_data.shape == (16, 8, 8, 1)
    b = next(iter(dm.train_dataloader()))
    assert b.shape == (4, 8, 8, 1)


def test_reduction_fn_schedule():
    from iddiff.training.modules import get_reduction_fn

    f = get_reduction_fn(y0=10.0, xk=1000, yk=1.0)
    np.testing.assert_allclose(f(0), 10.0, rtol=1e-6)
    np.testing.assert_allclose(f(1000), 1.0, rtol=1e-6)
    assert f(500) < 10.0 and f(500) > 1.0


def test_haar_multiscale_training_module(tmp_path):
    """Train a ddpm on Haar-space FixedSquares for a few steps."""
    from iddiff.training import Trainer
    from tests.test_image_models import image_config

    config = image_config("ddpm", image_size=8, channels=4)
    config.logging = ml_collections.ConfigDict(
        {"top_k": 1, "every_n_epochs": None, "envery_timedelta": None}
    )
    config.seed = 0
    config.training.lightning_module = "haar_multiscale"
    config.training.num_epochs = 1
    config.training.n_iters = 4
    config.training.log_freq = 1
    config.training.batch_size = 8
    config.training.reduce_mean = False
    config.training.likelihood_weighting = True
    config.training.sde = "vesde"
    config.training.visualization_callback = None
    config.training.workers = 0
    config.training.accumulate_grad_batches = 1
    config.validation = ml_collections.ConfigDict({"batch_size": 8, "workers": 0})
    config.eval = ml_collections.ConfigDict({"batch_size": 8, "workers": 0})
    config.model.sigma_max = 5.0
    config.model.sigma_min = 1e-2
    config.model.num_scales = 20
    config.model.ema_rate = 0.999
    config.model.input_channels = 4
    config.model.output_channels = 4
    config.data.update(dict(
        datamodule="Synthetic", dataset_type="FixedSquaresManifold",
        data_samples=64, num_squares=3, square_range=[3], image_size=16,
        split=[0.8, 0.1, 0.1], return_labels=False, use_data_mean=False,
    ))
    config.data.effective_image_size = 8  # net runs in 8x8 Haar space
    config.optim = ml_collections.ConfigDict(dict(
        weight_decay=0.0, optimizer="Adam", lr=1e-3, beta1=0.9, eps=1e-8,
        warmup=2, grad_clip=1.0,
    ))
    trainer = Trainer(config, workdir=str(tmp_path / "haar"))
    state = trainer.fit()
    assert int(state.step) == 4


def test_synthetic_timeseries_module():
    from iddiff.data import create_datamodule

    c = ml_collections.ConfigDict()
    c.seed = 0
    c.data = ml_collections.ConfigDict(dict(
        datamodule="SyntheticTimeSeries", data_samples=64, L_1=8, L_2=4,
        n_features=3, split=[0.8, 0.1, 0.1], return_labels=False,
    ))
    for k in ["training", "validation", "eval"]:
        setattr(c, k, ml_collections.ConfigDict({"batch_size": 8, "workers": 0}))
    dm = create_datamodule(c)
    dm.setup()
    cond, target = next(iter(dm.train_dataloader()))
    assert cond.shape == (8, 8, 3)
    assert target.shape == (8, 4, 3)


def test_conditional_decreasing_variance_trainer(tmp_path):
    """Two-SDE decreasing-variance module: trains and anneals σ_y per the
    inverse-multiplicative schedule (traced scalars, no recompiles)."""
    from iddiff.training import Trainer
    from iddiff.configs.default import get_default_configs

    c = get_default_configs()
    c.training.lightning_module = "conditional_decreasing_variance"
    c.training.batch_size = 16
    c.validation.batch_size = 16
    c.eval.batch_size = 16
    c.training.num_epochs = 2
    c.training.n_iters = 20
    c.training.log_freq = 5
    c.training.sde = "vesde"
    c.training.conditioning_approach = "ve"
    c.training.visualization_callback = None
    c.data = ml_collections.ConfigDict(dict(
        datamodule="ConditionalSynthetic", data_samples=200, ambient_dim=6,
        manifold_dim=2, split=[0.8, 0.1, 0.1], return_labels=False,
        use_data_mean=False,
    ))
    c.model = ml_collections.ConfigDict(dict(
        name="fcn_joint", checkpoint_path=None, state_size=6,
        hidden_layers=1, hidden_nodes=32, dropout=0.0, num_scales=50,
        ema_rate=0.999, sigma_min_x=1e-2, sigma_max_x=2.0,
        sigma_min_y=1e-2, sigma_max_y=2.0, sigma_min_y_target=1e-3,
        sigma_max_y_target=0.2, reach_target_steps=100,
    ))
    trainer = Trainer(c, workdir=str(tmp_path / "dv"))
    state = trainer.fit()
    assert int(state.step) == 20
    s0 = trainer.scalars_fn(0, 0)
    s100 = trainer.scalars_fn(0, 100)
    np.testing.assert_allclose(float(s0[1]), 2.0, rtol=1e-5)
    np.testing.assert_allclose(float(s100[1]), 0.2, rtol=1e-5)
