"""Predictor step functions for reverse-time SDE sampling.

Functional rebuild of /root/reference/sampling/predictors.py:30-256.  Where
the reference instantiates Predictor objects every step inside the sampling
loop (sampling/unconditional.py:318-341), here a predictor factory is called
ONCE at trace time and returns a pure `step(rng, x, t) -> (x, x_mean)`
closed over (sde, score_fn), so the whole sampler compiles to a single
lax.scan.  Conditional variants take `step(rng, x, y, t)`.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from iddiff.sde import VESDE, VPSDE, CVESDE
from iddiff.utils import Registry, batch_mul

PREDICTORS = Registry("predictor")
register_predictor = PREDICTORS.register
get_predictor = PREDICTORS.get


@register_predictor(name="euler_maruyama")
def euler_maruyama(sde, score_fn, probability_flow=False):
    """(predictors.py:52-63)"""
    rsde = sde.reverse(score_fn, probability_flow)
    dt = -1.0 / rsde.N

    def step(rng, x, t):
        z = jax.random.normal(rng, x.shape, dtype=x.dtype)
        drift, diffusion = rsde.sde(x, t)
        x_mean = x + drift * dt
        x_new = x_mean + batch_mul(diffusion, z) * math.sqrt(-dt)
        return x_new, x_mean

    return step


@register_predictor(name="reverse_diffusion")
def reverse_diffusion(sde, score_fn, probability_flow=False):
    """(predictors.py:133-143)"""
    rsde = sde.reverse(score_fn, probability_flow)

    def step(rng, x, t):
        f, G = rsde.discretize(x, t)
        z = jax.random.normal(rng, x.shape, dtype=x.dtype)
        x_mean = x - f
        x_new = x_mean + batch_mul(G, z)
        return x_new, x_mean

    return step


@register_predictor(name="heun")
def heun(sde, score_fn, probability_flow=True):
    """PECE (predict-evaluate-correct-evaluate) Heun stepper on the
    probability-flow ODE (predictors.py:65-117), quadratic accuracy."""
    h = -1.0 / sde.N

    def f(x, t):
        drift, diffusion = sde.sde(x, t)
        score = score_fn(x, t)
        return drift - batch_mul(diffusion**2, score) * 0.5

    def step(rng, x, t):
        f0 = f(x, t)
        x1 = x + f0 * h
        f1 = f(x1, t + h)
        x2 = x + h / 2 * (f1 + f0)
        return x2, x2

    return step


@register_predictor(name="ancestral_sampling")
def ancestral_sampling(sde, score_fn, probability_flow=False):
    """VE (SMLD) + VP (DDPM) ancestral steps (predictors.py:159-195)."""
    assert not probability_flow, "ancestral sampling has no ODE mode"

    if isinstance(sde, (VESDE, CVESDE)):
        def step(rng, x, t):
            timestep = (t * (sde.N - 1) / sde.T).astype(jnp.int32)
            sigma = sde.discrete_sigma(timestep)
            adjacent = jnp.where(
                timestep == 0, jnp.zeros_like(sigma), sde.discrete_sigma(timestep - 1)
            )
            score = score_fn(x, t)
            x_mean = x + batch_mul(sigma**2 - adjacent**2, score)
            std = jnp.sqrt(adjacent**2 * (sigma**2 - adjacent**2) / sigma**2)
            noise = jax.random.normal(rng, x.shape, dtype=x.dtype)
            return x_mean + batch_mul(std, noise), x_mean

        return step

    if isinstance(sde, VPSDE):
        def step(rng, x, t):
            timestep = (t * (sde.N - 1) / sde.T).astype(jnp.int32)
            beta = sde.discrete_betas[timestep]
            score = score_fn(x, t)
            x_mean = batch_mul(1.0 / jnp.sqrt(1.0 - beta), x + batch_mul(beta, score))
            noise = jax.random.normal(rng, x.shape, dtype=x.dtype)
            return x_mean + batch_mul(jnp.sqrt(beta), noise), x_mean

        return step

    raise NotImplementedError(
        f"ancestral sampling unsupported for {type(sde).__name__}"
    )


@register_predictor(name="none")
def none_predictor(sde, score_fn, probability_flow=False):
    """(predictors.py:237-245)"""

    def step(rng, x, t):
        return x, x

    return step


# --- conditional variants: step(rng, x, y, t) -------------------------------

@register_predictor(name="conditional_euler_maruyama")
def conditional_euler_maruyama(sde, score_fn, probability_flow=False):
    """(predictors.py:119-130); score_fn takes (x, y, t)."""
    rsde = sde.reverse(score_fn, probability_flow)
    dt = -1.0 / rsde.N

    def step(rng, x, y, t):
        z = jax.random.normal(rng, x.shape, dtype=x.dtype)
        drift, diffusion = rsde.sde(x, y, t)
        x_mean = x + drift * dt
        return x_mean + batch_mul(diffusion, z) * math.sqrt(-dt), x_mean

    return step


@register_predictor(name="conditional_reverse_diffusion")
def conditional_reverse_diffusion(sde, score_fn, probability_flow=False):
    """(predictors.py:146-156)"""
    rsde = sde.reverse(score_fn, probability_flow)

    def step(rng, x, y, t):
        f, G = rsde.discretize(x, y, t)
        z = jax.random.normal(rng, x.shape, dtype=x.dtype)
        x_mean = x - f
        return x_mean + batch_mul(G, z), x_mean

    return step


@register_predictor(name="conditional_ancestral_sampling")
def conditional_ancestral_sampling(sde, score_fn, probability_flow=False):
    """(predictors.py:197-234); VE-family only, like the reference's reachable path."""
    assert not probability_flow
    if not isinstance(sde, (VESDE, CVESDE)):
        raise NotImplementedError("conditional ancestral sampling: VE-family only")

    def step(rng, x, y, t):
        timestep = (t * (sde.N - 1) / sde.T).astype(jnp.int32)
        sigma = sde.discrete_sigma(timestep)
        adjacent = jnp.where(
            timestep == 0, jnp.zeros_like(sigma), sde.discrete_sigma(timestep - 1)
        )
        score = score_fn(x, y, t)
        x_mean = x + batch_mul(sigma**2 - adjacent**2, score)
        std = jnp.sqrt(adjacent**2 * (sigma**2 - adjacent**2) / sigma**2)
        noise = jax.random.normal(rng, x.shape, dtype=x.dtype)
        return x_mean + batch_mul(std, noise), x_mean

    return step


@register_predictor(name="conditional_none")
def conditional_none_predictor(sde, score_fn, probability_flow=False):
    def step(rng, x, y, t):
        return x, x

    return step
