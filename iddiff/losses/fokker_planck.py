"""Fokker–Planck residual loss for potential models.

Rebuild of /root/reference/lightning_modules/FokkerPlanckModel.py:62-155:
the smoothed density must satisfy ∂_t log p = ½ g(t)² (‖∇ log p‖² + Δ log p);
the loss penalizes |∂_t E − ½g²(‖∇E‖² + div ∇E)| · g² on perturbed data,
combined with the DSM loss under a constant/geometric/linear weight
schedule (:139-146).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from iddiff.utils import batch_mul, flatten_batch


def get_fp_loss_fn(sde, model, hutchinson: bool = True, eps: float = 1e-5,
                   train: bool = True):
    """Pure (params, batch, rng) -> scalar FP-residual loss."""

    def loss_fn(params, batch, rng):
        rng_t, rng_z, rng_h, rng_drop = jax.random.split(rng, 4)
        t = jax.random.uniform(
            rng_t, (batch.shape[0],), dtype=batch.dtype,
            minval=eps, maxval=sde.T,
        )
        g2 = sde.sde(jnp.zeros_like(t), t)[1] ** 2
        z = jax.random.normal(rng_z, batch.shape, dtype=batch.dtype)
        mean, std = sde.marginal_prob(batch, t)
        x = mean + batch_mul(std, z)

        variables = {"params": params}
        kwargs = {"train": train}
        rngs = {"dropout": rng_drop}

        def score(xi):
            return model.apply(variables, xi, t, method=model.score,
                               rngs=rngs, **kwargs)

        s = score(x)
        grad_norm2 = jnp.sum(flatten_batch(s) ** 2, axis=-1)

        if hutchinson:
            epsilon = (
                jax.random.randint(rng_h, x.shape, 0, 2).astype(x.dtype) * 2 - 1
            )
            _, jvp_eps = jax.jvp(score, (x,), (epsilon,))
            divergence = jnp.sum(
                flatten_batch(jvp_eps * epsilon), axis=-1
            )
        else:
            divergence = model.apply(
                variables, x, t, method=model.trace_hessian_log_energy,
                rngs=rngs, **kwargs,
            )

        def log_energy_sum(ti):
            return jnp.sum(
                model.apply(variables, x, ti, method=model.log_energy,
                            rngs=rngs, **kwargs)
            )

        time_derivative = jax.grad(log_energy_sum)(t)

        difference = time_derivative - (g2 / 2) * (grad_norm2 + divergence)
        return jnp.mean(jnp.abs(g2 * difference))

    return loss_fn


def fp_weight_schedule(config, epoch: int) -> float:
    """constant | geometric | linear (FokkerPlanckModel.py:139-146)."""
    schedule = config.training.get("schedule", "constant")
    N = config.training.num_epochs
    t = epoch / N
    if schedule == "constant":
        return float(config.training.alpha)
    if schedule == "geometric":
        a0, a1 = config.training.alpha_min, config.training.alpha_max
        return float(a0 * (a1 / a0) ** t)
    if schedule == "linear":
        a0, a1 = config.training.alpha_min, config.training.alpha_max
        return float((1 - t) * a0 + t * a1)
    raise ValueError(f"FP weight schedule '{schedule}' unknown")
