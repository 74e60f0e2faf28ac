"""Probability-flow-ODE log-likelihood (bits/dim), fully on device.

Rebuild of /root/reference/likelihood.py:26-130: integrate the augmented
ODE d[x, logp]/dt along the probability flow from eps to T, estimating the
divergence with the Hutchinson–Skilling estimator (Rademacher/Gaussian ε via
one jvp) or exactly (vmapped Jacobian rows, likelihood.py:33-41), then add
the prior log-density.  The reference round-trips scipy's RK45 through
numpy per RHS eval (:103-117); here the whole solve is one jitted
Dormand–Prince loop (iddiff.sampling.integrators).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from iddiff.models import get_score_fn
from iddiff.sampling.integrators import odeint_rk45
from iddiff.utils import batch_mul


def get_likelihood_fn(sde, model, hutchinson_type: str = "Rademacher",
                      rtol: float = 1e-5, atol: float = 1e-5,
                      eps: float = 1e-5, exact_divergence: bool = False,
                      bits_per_dim: bool = True):
    """Build `likelihood_fn(rng, params, data) -> (bpd, z, nfev)`.

    Documented deviation: the reference's nats→bits/dim conversion is
    commented out (likelihood.py:121-125), so it returns the raw negative
    log-likelihood in nats; we default to true bits/dim
    (nats / d / ln 2) and expose `bits_per_dim=False` for the reference's
    literal behaviour.  The inverse-scaler offset is omitted (data assumed
    already in model space).
    """

    def likelihood_fn(rng, params, data):
        score_fn = get_score_fn(sde, model, params, train=False, continuous=True)
        shape = data.shape
        B = shape[0]
        d = int(np.prod(shape[1:]))

        def drift_fn(x, t):
            """Probability-flow drift f - ½ g² s (likelihood.py:19-24)."""
            vec_t = jnp.full((B,), t, dtype=x.dtype)
            drift, diffusion = sde.sde(x, vec_t)
            return drift - 0.5 * batch_mul(diffusion**2, score_fn(x, vec_t))

        rng, eps_rng = jax.random.split(rng)
        if hutchinson_type.lower() == "rademacher":
            epsilon = (
                jax.random.randint(eps_rng, shape, 0, 2).astype(data.dtype) * 2 - 1
            )
        elif hutchinson_type.lower() == "gaussian":
            epsilon = jax.random.normal(eps_rng, shape, dtype=data.dtype)
        else:
            raise NotImplementedError(f"Hutchinson type '{hutchinson_type}'")

        def div_fn(x, t):
            if exact_divergence:
                # trace of the Jacobian row-by-row (likelihood.py:33-41)
                x_flat = x.reshape(B, d)

                def f_flat(xf):
                    return drift_fn(xf.reshape(shape), t).reshape(B, d)

                basis = jnp.eye(d, dtype=x.dtype)

                def row(e):
                    _, jvp_e = jax.jvp(
                        f_flat, (x_flat,), (jnp.broadcast_to(e[None], (B, d)),)
                    )
                    return jnp.sum(jvp_e * e[None], axis=-1)

                return jax.vmap(row)(basis).sum(axis=0)
            # Hutchinson: εᵀ(∂f/∂x)ε with one jvp (likelihood.py:43-49)
            _, jvp_eps = jax.jvp(lambda y: drift_fn(y, t), (x,), (epsilon,))
            return jnp.sum(
                (jvp_eps * epsilon).reshape(B, -1), axis=-1
            )

        def rhs(t, aug):
            x = aug[: B * d].reshape(shape)
            dx = drift_fn(x, t).reshape(-1)
            dlogp = div_fn(x, t)
            return jnp.concatenate([dx, dlogp])

        aug0 = jnp.concatenate(
            [data.reshape(-1), jnp.zeros((B,), data.dtype)]
        )
        result = odeint_rk45(rhs, aug0, eps, sde.T, rtol=rtol, atol=atol)
        z = result.y[: B * d].reshape(shape)
        delta_logp = result.y[B * d:]
        prior_logp = sde.prior_logp(z)
        nats = -(prior_logp + delta_logp)
        bpd = nats / math.log(2) / d if bits_per_dim else nats
        return bpd, z, result.nfev

    return jax.jit(likelihood_fn)
