"""Curl (non-conservativity) penalty for 2-D score fields.

Rebuild of /root/reference/lightning_modules/ConservativeSdeGenerativeModel.py:28-68:
penalize (∂_x v_y − ∂_y v_x)² (or its max) weighted by g(t)² on perturbed
data — here one jacfwd instead of two autograd passes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from iddiff.utils import batch_mul


def get_curl_penalty_fn(sde, model, penalty_type: str = "L2",
                        eps: float = 1e-5, train: bool = True):
    def penalty_fn(params, batch, rng):
        rng_t, rng_z, rng_drop = jax.random.split(rng, 3)
        t = jax.random.uniform(
            rng_t, (batch.shape[0],), dtype=batch.dtype,
            minval=eps, maxval=sde.T,
        )
        z = jax.random.normal(rng_z, batch.shape, dtype=batch.dtype)
        mean, std = sde.marginal_prob(batch, t)
        x = mean + batch_mul(std, z)

        def field_one(xi, ti):
            out = model.apply(
                {"params": params}, xi[None], ti[None], train=train,
                rngs={"dropout": rng_drop},
            )
            return out[0]

        # per-sample 2x2 Jacobian: curl = J[1,0] - J[0,1]
        jac = jax.vmap(jax.jacfwd(field_one))(x, t)
        curl = jac[:, 1, 0] - jac[:, 0, 1]
        g2 = sde.sde(jnp.zeros_like(t), t)[1] ** 2
        if penalty_type == "L2":
            return jnp.mean(g2 * curl**2)
        if penalty_type == "Linfty":
            return jnp.max(g2 * jnp.abs(curl))
        raise ValueError(f"curl penalty type '{penalty_type}' unknown")

    return penalty_fn
