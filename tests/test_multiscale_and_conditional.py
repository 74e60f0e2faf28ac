"""End-to-end multi-scale test pipeline + conditional sampling/test mode."""
import os

import jax
import jax.numpy as jnp
import ml_collections
import numpy as np
import pytest


def _haar_level_config(tmpdir, level_name, image_size, channels):
    """A tiny haar_multiscale config whose model runs on 4*channels bands."""
    from tests.test_image_models import image_config

    config = image_config("ddpm", image_size=image_size // 2,
                          channels=4 * channels)
    config.logging = ml_collections.ConfigDict(
        {"top_k": 1, "every_n_epochs": None, "envery_timedelta": None,
         "log_path": str(tmpdir), "log_name": level_name}
    )
    config.seed = 0
    config.training.lightning_module = "haar_multiscale"
    config.training.num_epochs = 1
    config.training.n_iters = 3
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
    config.model.num_scales = 10
    config.model.ema_rate = 0.999
    config.model.input_channels = 4 * channels
    config.model.output_channels = 4 * channels
    config.data.update(dict(
        datamodule="Synthetic", dataset_type="FixedSquaresManifold",
        data_samples=48, num_squares=3, square_range=[3],
        image_size=image_size, split=[0.7, 0.15, 0.15], return_labels=False,
        use_data_mean=False,
    ))
    config.data.effective_image_size = image_size // 2
    config.sampling = ml_collections.ConfigDict(dict(
        method="pc", predictor="reverse_diffusion", corrector="none",
        n_steps_each=1, noise_removal=True, probability_flow=False, snr=0.15,
    ))
    config.optim = ml_collections.ConfigDict(dict(
        weight_decay=0.0, optimizer="Adam", lr=1e-3, beta1=0.9, eps=1e-8,
        warmup=2, grad_clip=1.0,
    ))
    return config


def test_multi_scale_test_pipeline(tmp_path):
    """Train two tiny haar levels, then run the coarse→fine pipeline
    (run_lib.py:103-322 equivalent)."""
    from iddiff.multiscale import multi_scale_test
    from iddiff.training import Trainer

    # level 1 (coarse): 8x8 images -> model in 4x4 Haar space
    c_coarse = _haar_level_config(tmp_path, "coarse", 8, 1)
    Trainer(c_coarse, workdir=str(tmp_path / "coarse")).fit()
    # level 0 (fine): 16x16 images -> model in 8x8 Haar space
    c_fine = _haar_level_config(tmp_path, "fine", 16, 1)
    Trainer(c_fine, workdir=str(tmp_path / "fine")).fit()

    top = ml_collections.ConfigDict()
    top.logging = ml_collections.ConfigDict(
        {"log_path": str(tmp_path), "log_name": "ms_out"}
    )
    top.multiscale = ml_collections.ConfigDict(
        {"levels": [c_coarse, c_fine]}
    )
    images = multi_scale_test(top, num_samples=4)
    assert images.shape == (4, 16, 16, 1)
    assert np.all(np.isfinite(images))
    assert os.path.exists(tmp_path / "ms_out" / "multiscale_samples.npy")


def test_conditional_sampler_with_fcn_joint():
    """Two-SDE conditional PC sampling through the public factory."""
    from iddiff.models import create_model
    from iddiff.sampling import get_pc_conditional_sampler
    from iddiff.sde import CVESDE, VESDE

    c = ml_collections.ConfigDict()
    c.model = ml_collections.ConfigDict(dict(
        name="fcn_joint", state_size=6, hidden_layers=1, hidden_nodes=32,
        dropout=0.0,
    ))
    model = create_model(c)
    sde = {"x": CVESDE(sigma_min=0.01, sigma_max=2.0, N=20),
           "y": VESDE(sigma_min=0.01, sigma_max=2.0, N=20)}
    batch = {"x": jnp.ones((4, 6)), "y": jnp.ones((4, 1))}
    params = model.init(jax.random.PRNGKey(0), batch, jnp.zeros((4,)))["params"]

    for use_path in [False, True]:
        sampler = get_pc_conditional_sampler(
            sde, model, (4, 6), predictor="conditional_reverse_diffusion",
            corrector="conditional_none", snr=0.15, p_steps=20,
            use_path=use_path, eps=1e-5,
        )
        out = sampler(jax.random.PRNGKey(1), params, jnp.ones((4, 1)))
        assert out.shape == (4, 6)
        assert np.all(np.isfinite(np.asarray(out)))


def test_run_lib_test_mode_with_sr_metrics(tmp_path):
    """run_lib.test on a paired SR config reports PSNR/SSIM."""
    from iddiff import run_lib

    c = ml_collections.ConfigDict()
    c.seed = 0
    c.logging = ml_collections.ConfigDict(
        {"log_path": str(tmp_path), "log_name": "sr",
         "top_k": 1, "every_n_epochs": None, "envery_timedelta": None}
    )
    c.training = ml_collections.ConfigDict(dict(
        lightning_module="conditional", conditioning_approach="sr3",
        batch_size=8, num_epochs=1, n_iters=2, log_freq=1,
        likelihood_weighting=True, continuous=True, reduce_mean=False,
        sde="vesde", visualization_callback=None, workers=0,
        accumulate_grad_batches=1, show_evolution=False,
    ))
    c.validation = ml_collections.ConfigDict({"batch_size": 8, "workers": 0})
    c.eval = ml_collections.ConfigDict({"batch_size": 8, "workers": 0})
    c.sampling = ml_collections.ConfigDict(dict(
        method="pc", predictor="conditional_reverse_diffusion",
        corrector="conditional_none", n_steps_each=1, noise_removal=True,
        probability_flow=False, snr=0.15,
    ))
    c.data = ml_collections.ConfigDict(dict(
        datamodule="paired", base_datamodule="Synthetic",
        dataset_type="FixedSquaresManifold", data_samples=48, num_squares=3,
        square_range=[3], image_size=16, split=[0.7, 0.15, 0.15], scale=2,
        upsample_lr=True,  # SR3 contract: condition at HR resolution
        return_labels=False, use_data_mean=False, centered=False,
        num_channels=1, effective_image_size=16,
    ))
    c.model = ml_collections.ConfigDict(dict(
        name="ddpm_paired_SR3", checkpoint_path=None,
        sigma_min_x=1e-2, sigma_max_x=5.0, num_scales=10, ema_rate=0.999,
        nf=8, ch_mult=[1, 2], num_res_blocks=1, attn_resolutions=[8],
        dropout=0.0, resamp_with_conv=True, conditional=True,
        nonlinearity="swish", input_channels=2, output_channels=1,
    ))
    c.optim = ml_collections.ConfigDict(dict(
        weight_decay=0.0, optimizer="Adam", lr=1e-3, beta1=0.9, eps=1e-8,
        warmup=2, grad_clip=1.0,
    ))
    # quick train so a checkpoint exists, then test mode
    run_lib.train(c, resume=False)
    result = run_lib.test(c)
    assert "test_loss" in result
    assert "test_psnr" in result and np.isfinite(result["test_psnr"])
    assert "test_ssim" in result
