"""Multi-scale autoregressive test: sample coarse→fine through Haar levels.

Rebuild of /root/reference/run_lib.py:103-322 (`multi_scale_test`): one
trained module per pyramid level; starting from DC coefficients at the
coarsest level, each level's model inpaints the HF bands given the DC band,
then the inverse Haar produces the next-finer DC — autoregressively up to
full resolution.

Config surface: config.multiscale.levels = list of per-level workdirs (or
config paths) ordered coarse → fine; each level's model must accept the
4C-channel Haar layout.  For levels without a checkpoint the HF bands are
inpainted with the PC inpainter and fresh model params (smoke mode).
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


def haar_inpaint_level(rng, config, sde, model, params, dc, eps):
    """Inpaint HF bands given DC: known region = first C channels
    (run_lib.py:171-184 semantics on the subband-major layout)."""
    from iddiff.sampling import get_pc_inpainter

    B, h, w, C = dc.shape
    data = jnp.concatenate([dc, jnp.zeros((B, h, w, 3 * C), dc.dtype)], axis=-1)
    mask = jnp.concatenate(
        [jnp.ones((B, h, w, C)), jnp.zeros((B, h, w, 3 * C))], axis=-1
    ).astype(dc.dtype)
    inpainter = get_pc_inpainter(
        sde, model,
        predictor=config.sampling.predictor.lower(),
        corrector=config.sampling.corrector.lower(),
        snr=config.sampling.snr,
        n_steps_each=config.sampling.n_steps_each,
        continuous=config.training.continuous,
        denoise=config.sampling.noise_removal,
        eps=eps,
    )
    return inpainter(rng, params, data, mask)


def multi_scale_test(config, workdir: str | None = None, num_samples: int = 16,
                     seed: int = 0):
    """Autoregressive coarse→fine sampling; returns full-resolution images."""
    from iddiff.models import create_model
    from iddiff.nn.haar import haar_backward
    from iddiff.run_lib import _restore_eval_params, _workdir
    from iddiff.sampling import get_pc_sampler
    from iddiff.sde import get_sde

    wd = _workdir(config, workdir)
    levels = list(config.multiscale.levels)  # coarse -> fine level configs
    rng = jax.random.PRNGKey(seed)

    from iddiff.configs.utils import read_config

    level_cfgs = [read_config(p) if isinstance(p, str) else p for p in levels]

    # 1. unconditional sample at the coarsest level (in Haar space)
    c0 = level_cfgs[0]
    sde0, eps0 = get_sde(c0)
    model0 = create_model(c0)
    from iddiff.data import create_datamodule

    dm0 = create_datamodule(c0)
    dm0.setup()
    params0 = _restore_eval_params(c0, model0, dm0, _workdir(c0))
    data_shape = tuple(dm0.train_data.shape[1:])
    if c0.training.get("lightning_module", "base") == "haar_multiscale":
        H, W, C = data_shape
        data_shape = (H // 2, W // 2, 4 * C)  # model lives in Haar space
    shape0 = (num_samples,) + data_shape
    rng, k0 = jax.random.split(rng)
    sampler = get_pc_sampler(
        sde0, model0, shape0,
        predictor=c0.sampling.predictor.lower(),
        corrector=c0.sampling.corrector.lower(),
        snr=c0.sampling.snr, eps=eps0,
        denoise=c0.sampling.noise_removal,
    )
    haar_sample = sampler(k0, params0)
    C = haar_sample.shape[-1] // 4
    a = haar_backward(haar_sample)  # DC of the next-finer level

    # 2. walk up the pyramid: inpaint HF given DC, invert
    for cfg in level_cfgs[1:]:
        sde_i, eps_i = get_sde(cfg)
        model_i = create_model(cfg)
        dm_i = create_datamodule(cfg)
        dm_i.setup()
        params_i = _restore_eval_params(cfg, model_i, dm_i, _workdir(cfg))
        rng, ki = jax.random.split(rng)
        full = haar_inpaint_level(ki, cfg, sde_i, model_i, params_i, a, eps_i)
        a = haar_backward(full)

    images = np.asarray(a)
    os.makedirs(wd, exist_ok=True)
    np.save(os.path.join(wd, "multiscale_samples.npy"), images)
    try:
        from iddiff.analysis.plots import image_grid
        import matplotlib.pyplot as plt

        grid = image_grid(images)
        plt.imsave(
            os.path.join(wd, "multiscale_samples.png"),
            grid.squeeze() if grid.shape[-1] == 1 else grid,
            cmap="gray" if grid.shape[-1] == 1 else None,
        )
    except Exception:
        pass
    print(f"[iddiff] multi_scale_test: wrote {images.shape} samples to {wd}")
    return images
