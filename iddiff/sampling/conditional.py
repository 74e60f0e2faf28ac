"""Conditional PC sampling: sample x | y under a conditional score.

Rebuild of /root/reference/sampling/conditional.py:8-254 as a scanned jitted
loop.  Two y-handling modes:
  - standard: y is re-perturbed to the current t each step via
    sde['y'].marginal_prob (conditional.py:104-110)
  - use_path: y follows a single reverse path sampled from the backward
    kernel p(y_t | y_0, y_{t+τ}) (conditional.py:86-100, VESDE
    compute_backward_kernel)
For single-SDE (SR3) conditioning, y is passed through unchanged
(conditional.py:111-116).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from iddiff.models import get_score_fn, get_conditional_score_fn
from iddiff.utils import batch_mul

from .correctors import get_corrector
from .predictors import get_predictor


def get_pc_conditional_sampler(sde, model, shape, predictor, corrector, snr,
                               p_steps, c_steps=1, probability_flow=False,
                               continuous=True, denoise=True, use_path=False,
                               eps=1e-5):
    """Returns `sampler(rng, params, y) -> samples`."""
    p_factory = get_predictor(predictor)
    c_factory = get_corrector(corrector)
    c_sde = sde["x"] if isinstance(sde, dict) else sde
    timesteps = jnp.linspace(c_sde.T, eps, p_steps)
    is_dict = isinstance(sde, dict)

    def sampler(rng, params, y):
        raw_score_fn = get_score_fn(sde, model, params, conditional=True,
                                    train=False, continuous=continuous)
        score_fn = get_conditional_score_fn(raw_score_fn, target_domain="x")
        p_step = p_factory(c_sde, score_fn, probability_flow)
        c_step = c_factory(c_sde, score_fn, snr, c_steps)

        rng, rng_prior = jax.random.split(rng)
        x = c_sde.prior_sampling(rng_prior, shape)
        B = shape[0]

        if is_dict and use_path:
            # initialize y_{T+τ} from the forward marginal (conditional.py:144-148)
            tau = timesteps[0] - timesteps[1]
            rng, k0 = jax.random.split(rng)
            vec_Tt = jnp.full((B,), c_sde.T + tau, dtype=x.dtype)
            y_mean, y_std = sde["y"].marginal_prob(y, vec_Tt)
            y_tplustau = y_mean + batch_mul(
                y_std, jax.random.normal(k0, y.shape, dtype=y.dtype)
            )

            def body(carry, t):
                rng, x, y_prev = carry
                rng, k_y, k_p, k_c = jax.random.split(rng, 4)
                vec_t = jnp.full((B,), t, dtype=x.dtype)
                vec_tau = jnp.full((B,), tau, dtype=x.dtype)
                yt_mean, yt_std = sde["y"].compute_backward_kernel(
                    y, y_prev, vec_t, vec_tau
                )
                y_t = yt_mean + batch_mul(
                    yt_std, jax.random.normal(k_y, y.shape, dtype=y.dtype)
                )
                x_new, x_mean = p_step(k_p, x, y_t, vec_t)
                x_new, x_mean = c_step(k_c, x_new, y_t, vec_t)
                return (rng, x_new, y_t), x_mean

            (rng, x, _), x_means = jax.lax.scan(body, (rng, x, y_tplustau), timesteps)
            return x_means[-1] if denoise else x

        def body(carry, t):
            rng, x = carry
            rng, k_y, k_p, k_c = jax.random.split(rng, 4)
            vec_t = jnp.full((B,), t, dtype=x.dtype)
            if is_dict:
                y_mean, y_std = sde["y"].marginal_prob(y, vec_t)
                y_t = y_mean + batch_mul(
                    y_std, jax.random.normal(k_y, y.shape, dtype=y.dtype)
                )
            else:
                y_t = y  # SR3: clean condition throughout (conditional.py:111-116)
            x_new, x_mean = p_step(k_p, x, y_t, vec_t)
            x_new, x_mean = c_step(k_c, x_new, y_t, vec_t)
            return (rng, x_new), x_mean

        (rng, x), x_means = jax.lax.scan(body, (rng, x), timesteps)
        return x_means[-1] if denoise else x

    return jax.jit(sampler)


def get_conditional_sampling_fn(config, sde, model, shape, eps,
                                predictor="default", corrector="default",
                                p_steps="default", c_steps="default",
                                snr="default", denoise="default",
                                use_path="default"):
    """Config-driven wrapper (conditional.py:8-45)."""
    if predictor == "default":
        predictor = config.sampling.predictor.lower()
    if corrector == "default":
        corrector = config.sampling.corrector.lower()
    if p_steps == "default":
        p_steps = config.model.num_scales
    if c_steps == "default":
        c_steps = config.sampling.n_steps_each
    if snr == "default":
        snr = config.sampling.snr
    if denoise == "default":
        denoise = config.sampling.noise_removal
    if use_path == "default":
        use_path = config.sampling.get("use_path", False)
    return get_pc_conditional_sampler(
        sde, model, shape, predictor=predictor, corrector=corrector, snr=snr,
        p_steps=p_steps, c_steps=c_steps,
        probability_flow=config.sampling.probability_flow,
        continuous=config.training.continuous, denoise=denoise,
        use_path=use_path, eps=eps,
    )
