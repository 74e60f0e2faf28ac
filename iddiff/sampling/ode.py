"""Probability-flow ODE sampler, fully on device.

Rebuild of /root/reference/sampling/unconditional.py:66-131 (scipy RK45 with
numpy flatten/unflatten per RHS eval) as a jitted adaptive integrator: the
reverse probability-flow ODE dx/dt = f(x,t) − ½ g(t)² s_θ(x,t) is solved
from T to eps with on-device Dormand–Prince, then optionally denoised with
one reverse-diffusion step at eps (the reference's denoise_update_fn).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from iddiff.models import get_score_fn
from iddiff.utils import batch_mul

from .integrators import odeint_rk45
from .predictors import get_predictor


def get_ode_sampler(sde, model, shape, denoise=False, rtol=1e-5, atol=1e-5,
                    continuous=True, eps=1e-3):
    """Build `sampler(rng, params) -> (samples, nfev)`."""

    def sampler(rng, params):
        score_fn = get_score_fn(sde, model, params, train=False,
                                continuous=continuous)

        def rhs(t, flat_x):
            x = flat_x.reshape(shape)
            vec_t = jnp.full((shape[0],), t, dtype=flat_x.dtype)
            drift, diffusion = sde.sde(x, vec_t)
            drift = drift - 0.5 * batch_mul(diffusion**2, score_fn(x, vec_t))
            return drift.reshape(-1)

        rng, rng_prior, rng_denoise = jax.random.split(rng, 3)
        x = sde.prior_sampling(rng_prior, shape)
        result = odeint_rk45(rhs, x.reshape(-1), sde.T, eps, rtol=rtol, atol=atol)
        x = result.y.reshape(shape)

        if denoise:
            # one noiseless reverse-diffusion step at eps (:84-92 in the ref)
            p_step = get_predictor("reverse_diffusion")(
                sde, score_fn, probability_flow=False
            )
            vec_eps = jnp.full((shape[0],), eps, dtype=x.dtype)
            _, x = p_step(rng_denoise, x, vec_eps)
        return x, result.nfev

    return jax.jit(sampler)
