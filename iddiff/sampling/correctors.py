"""Corrector step functions (Langevin-family MCMC at fixed noise level).

Functional rebuild of /root/reference/sampling/correctors.py:29-232.  Each
factory returns a pure `step(rng, x, t) -> (x, x_mean)` running its
`n_steps` inner iterations as a lax.fori_loop.  Conventions preserved:
the Langevin step size uses grad_norm hard-coded to 1 (correctors.py:74)
and noise_norm = batch-mean of ‖z‖.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from iddiff.sde import VPSDE, SubVPSDE
from iddiff.utils import Registry, batch_mul, flatten_batch

CORRECTORS = Registry("corrector")
register_corrector = CORRECTORS.register
get_corrector = CORRECTORS.get


def _alpha(sde, t):
    """VP-family uses ᾱ discrete alphas; VE-family uses 1 (correctors.py:65-69)."""
    if isinstance(sde, (VPSDE, SubVPSDE)):
        timestep = (t * (sde.N - 1) / sde.T).astype(jnp.int32)
        return sde.alphas[timestep]
    return jnp.ones_like(t)


@register_corrector(name="langevin")
def langevin(sde, score_fn, snr, n_steps):
    """(correctors.py:51-80)"""

    def step(rng, x, t):
        alpha = _alpha(sde, t)

        def body(i, carry):
            rng, x, x_mean = carry
            rng, sub = jax.random.split(rng)
            grad = score_fn(x, t)
            noise = jax.random.normal(sub, x.shape, dtype=x.dtype)
            noise_norm = jnp.mean(
                jnp.linalg.norm(flatten_batch(noise), axis=-1)
            )
            step_size = (snr * noise_norm) ** 2 * 2 * alpha  # grad_norm == 1
            x_mean = x + batch_mul(step_size, grad)
            x = x_mean + batch_mul(jnp.sqrt(step_size * 2), noise)
            return rng, x, x_mean

        _, x, x_mean = jax.lax.fori_loop(0, n_steps, body, (rng, x, x))
        return x, x_mean

    return step


@register_corrector(name="ald")
def annealed_langevin(sde, score_fn, snr, n_steps):
    """NCSN/NCSNv2 annealed Langevin (correctors.py:177-210):
    step size = (snr·σ(t))²·2·α."""

    def step(rng, x, t):
        alpha = _alpha(sde, t)
        std = sde.marginal_prob(x, t)[1]

        def body(i, carry):
            rng, x, x_mean = carry
            rng, sub = jax.random.split(rng)
            grad = score_fn(x, t)
            noise = jax.random.normal(sub, x.shape, dtype=x.dtype)
            step_size = (snr * std) ** 2 * 2 * alpha
            x_mean = x + batch_mul(step_size, grad)
            x = x_mean + batch_mul(jnp.sqrt(step_size * 2), noise)
            return rng, x, x_mean

        _, x, x_mean = jax.lax.fori_loop(0, n_steps, body, (rng, x, x))
        return x, x_mean

    return step


@register_corrector(name="mala")
def mala(sde, score_fn, snr, n_steps, energy_fn=None):
    """Metropolis-adjusted Langevin (correctors.py:83-140); requires an
    `energy_fn(x, t)` (the reference wires model.energy,
    sampling/unconditional.py:336-338)."""
    assert energy_fn is not None, "MALA needs an energy_fn"

    def proposal_density(x, x0, step_size, t):
        grad = score_fn(x0, t)
        c = -0.25 * (1.0 / step_size)
        norm = jnp.linalg.norm(
            flatten_batch(x - x0 - batch_mul(step_size, grad)), axis=1
        ) ** 2
        return jnp.exp(c * norm)

    def step(rng, x, t):
        alpha = _alpha(sde, t)

        def body(i, carry):
            rng, x, x_mean = carry
            rng, k_noise, k_accept = jax.random.split(rng, 3)
            grad = score_fn(x, t)
            noise = jax.random.normal(k_noise, x.shape, dtype=x.dtype)
            step_size = snr**2 * 2 * alpha  # grad_norm = noise_norm = 1 (:120-122)
            prop_mean = x + batch_mul(step_size, grad)
            x_new = prop_mean + batch_mul(jnp.sqrt(step_size * 2), noise)

            num = energy_fn(x_new, t).squeeze() * proposal_density(
                x, x_new, step_size, t
            )
            den = energy_fn(x, t).squeeze() * proposal_density(
                x_new, x, step_size, t
            )
            accept_p = jnp.minimum(jnp.ones_like(num), num / den)
            u = jax.random.uniform(k_accept, accept_p.shape, dtype=x.dtype)
            cond = (u < accept_p).astype(x.dtype)
            x = batch_mul(1 - cond, x) + batch_mul(cond, x_new)
            x_mean = batch_mul(1 - cond, x) + batch_mul(cond, prop_mean)
            return rng, x, x_mean

        _, x, x_mean = jax.lax.fori_loop(0, n_steps, body, (rng, x, x))
        return x, x_mean

    return step


@register_corrector(name="none")
def none_corrector(sde, score_fn, snr, n_steps):
    def step(rng, x, t):
        return x, x

    return step


# --- conditional variants ----------------------------------------------------

@register_corrector(name="conditional_langevin")
def conditional_langevin(sde, score_fn, snr, n_steps):
    """(correctors.py:145-174): here grad_norm is NOT hardcoded to 1."""

    def step(rng, x, y, t):
        alpha = _alpha(sde, t)

        def body(i, carry):
            rng, x, x_mean = carry
            rng, sub = jax.random.split(rng)
            grad = score_fn(x, y, t)
            noise = jax.random.normal(sub, x.shape, dtype=x.dtype)
            grad_norm = jnp.mean(jnp.linalg.norm(flatten_batch(grad), axis=-1))
            noise_norm = jnp.mean(jnp.linalg.norm(flatten_batch(noise), axis=-1))
            step_size = (snr * noise_norm / grad_norm) ** 2 * 2 * alpha
            x_mean = x + batch_mul(step_size, grad)
            x = x_mean + batch_mul(jnp.sqrt(step_size * 2), noise)
            return rng, x, x_mean

        _, x, x_mean = jax.lax.fori_loop(0, n_steps, body, (rng, x, x))
        return x, x_mean

    return step


@register_corrector(name="conditional_none")
def conditional_none_corrector(sde, score_fn, snr, n_steps):
    def step(rng, x, y, t):
        return x, x

    return step
