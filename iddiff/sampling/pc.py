"""Predictor–Corrector sampling driver as a single jitted lax.scan.

Rebuild of /root/reference/sampling/unconditional.py:134-316.  The reference
re-instantiates score_fn + predictor/corrector objects EVERY step
(unconditional.py:318-341); here everything is closed over once and the
N-step loop is a lax.scan, so one compilation covers the full trajectory and
the TPU never returns to the host.  Samplers take (rng, params) so new
params (e.g. EMA swaps) do NOT trigger recompilation.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from iddiff.models import get_score_fn
from iddiff.utils import batch_mul

from .correctors import get_corrector
from .predictors import get_predictor


def get_pc_sampler(sde, model, shape, predictor="reverse_diffusion",
                   corrector="none", snr=0.15, n_steps_each=1,
                   probability_flow=False, continuous=True, denoise=True,
                   eps=1e-3, return_evolution=False):
    """Build `sampler(rng, params) -> samples` (or (samples, evolution))."""
    p_factory = get_predictor(predictor)
    c_factory = get_corrector(corrector)
    N = sde.N
    timesteps = jnp.linspace(sde.T, eps, N)

    def sampler(rng, params):
        score_fn = get_score_fn(sde, model, params, train=False,
                                continuous=continuous)
        p_step = p_factory(sde, score_fn, probability_flow)
        if corrector == "mala":
            # MALA needs the model's energy head (unconditional.py:336-338)
            def energy_fn(x, t):
                return model.apply(
                    {"params": params}, x, t * (sde.N - 1), method=model.energy
                )

            c_step = c_factory(sde, score_fn, snr, n_steps_each,
                               energy_fn=energy_fn)
        else:
            c_step = c_factory(sde, score_fn, snr, n_steps_each)

        rng, rng_prior = jax.random.split(rng)
        x0 = sde.prior_sampling(rng_prior, shape)

        def body(carry, t):
            rng, x = carry
            rng, k_c, k_p = jax.random.split(rng, 3)
            vec_t = jnp.full((shape[0],), t, dtype=x0.dtype)
            # corrector first, then predictor (unconditional.py:183-184)
            x, x_mean = c_step(k_c, x, vec_t)
            x, x_mean = p_step(k_p, x, vec_t)
            out = x if return_evolution else None
            return (rng, x), (x_mean, out) if return_evolution else x_mean

        (rng, x), ys = jax.lax.scan(body, (rng, x0), timesteps)
        if return_evolution:
            x_mean, evolution = ys
            final = x_mean[-1] if denoise else x
            return final, evolution
        x_mean = ys
        return x_mean[-1] if denoise else x

    return jax.jit(sampler)


def get_pc_inpainter(sde, model, predictor="reverse_diffusion",
                     corrector="none", snr=0.15, n_steps_each=1,
                     probability_flow=False, continuous=True, denoise=True,
                     eps=1e-3):
    """PC inpainting: re-project the known region each step.

    Rebuild of /root/reference/sampling/unconditional.py:201-316 — after each
    corrector/predictor update, known pixels are overwritten by the data
    diffused to the current t:  x ← x·(1−mask) + (data + σ(t)·z)·mask-complement
    semantics per the Song inpainting scheme used there (masked_data_mean +
    std·z on the known region).
    Returns `inpainter(rng, params, data, mask) -> samples`, mask=1 on KNOWN
    pixels.

    Documented deviation: the reference's `denoise=True` return carries the
    NOISY x on the unknown region — its inpaint_update_fn computes x_mean
    from the already-projected x (unconditional.py:241-244), so the final
    x_mean only denoises the known region.  We return the genuinely
    denoised predictor mean on the unknown region instead.
    """
    p_factory = get_predictor(predictor)
    c_factory = get_corrector(corrector)
    timesteps = jnp.linspace(sde.T, eps, sde.N)

    def inpainter(rng, params, data, mask):
        score_fn = get_score_fn(sde, model, params, train=False,
                                continuous=continuous)
        p_step = p_factory(sde, score_fn, probability_flow)
        c_step = c_factory(sde, score_fn, snr, n_steps_each)
        shape = data.shape

        def project(rng, x, t):
            """Overwrite known region with data diffused to time t."""
            mean, std = sde.marginal_prob(data, t)
            z = jax.random.normal(rng, shape, dtype=data.dtype)
            known = mean + batch_mul(std, z)
            return x * (1.0 - mask) + known * mask

        rng, rng_prior = jax.random.split(rng)
        # live reference init (unconditional.py:293): RAW data on the known
        # region + prior on the unknown (the diffuse-to-T variant is
        # commented out there)
        x = data * mask + sde.prior_sampling(rng_prior, shape) * (1.0 - mask)

        def body(carry, t):
            rng, x = carry
            rng, k_c, k_p, k_m1, k_m2 = jax.random.split(rng, 5)
            vec_t = jnp.full((shape[0],), t, dtype=data.dtype)
            x, x_mean = c_step(k_c, x, vec_t)
            x = project(k_m1, x, vec_t)
            x, x_mean = p_step(k_p, x, vec_t)
            x = project(k_m2, x, vec_t)
            # denoised output keeps the clean known region
            x_mean_proj = x_mean * (1.0 - mask) + data * mask
            return (rng, x), x_mean_proj

        (rng, x), x_means = jax.lax.scan(body, (rng, x), timesteps)
        return x_means[-1] if denoise else x

    return jax.jit(inpainter)
