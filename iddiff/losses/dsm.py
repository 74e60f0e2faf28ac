"""Continuous-time denoising-score-matching losses.

Functional rebuild of /root/reference/losses.py:54-190 (`get_general_sde_loss_fn`).
The returned loss_fn is pure: (params, batch, rng) -> scalar, jit/grad-safe.

Weighting matches the reference:
  - likelihood_weighting=False: λ(t) = σ(t)²  — implemented as
    ‖score·std + z‖² (losses.py:179-181)
  - likelihood_weighting=True:  λ(t) = g(t)²  — ‖score + z/std‖²·g²
    (losses.py:182-185)
Reduction: mean over data dims, or 0.5·sum (losses.py:68).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from iddiff.models import get_score_fn
from iddiff.utils import batch_mul, flatten_batch


def _reduce(losses, reduce_mean: bool):
    flat = flatten_batch(losses)
    if reduce_mean:
        return jnp.mean(flat, axis=-1)
    return 0.5 * jnp.sum(flat, axis=-1)


def _g2(sde, t):
    """g(t)² with a scalar dummy state (drift is unused)."""
    return sde.sde(jnp.zeros_like(t), t)[1] ** 2


def get_sde_loss_fn(sde, model, train: bool, conditional: bool = False,
                    reduce_mean: bool = True, continuous: bool = True,
                    likelihood_weighting: bool = True, eps: float = 1e-5):
    """Create a pure DSM loss function for arbitrary SDEs."""

    if conditional and isinstance(sde, dict) and len(sde) == 2:
        # Inverse problems with two SDEs {x: cVESDE, y: VESDE} (losses.py:75-101)
        assert likelihood_weighting, "two-SDE conditional requires likelihood weighting"

        def loss_fn(params, batch, rng):
            y, x = batch
            rng_t, rng_zy, rng_zx, rng_drop = jax.random.split(rng, 4)
            score_fn = get_score_fn(
                sde, model, params, conditional=True, train=train,
                continuous=continuous, rngs={"dropout": rng_drop},
            )
            t = jax.random.uniform(
                rng_t, (x.shape[0],), dtype=x.dtype,
                minval=eps, maxval=sde["x"].T,
            )
            z_y = jax.random.normal(rng_zy, y.shape, dtype=y.dtype)
            mean_y, std_y = sde["y"].marginal_prob(y, t)
            pert_y = mean_y + batch_mul(std_y, z_y)

            z_x = jax.random.normal(rng_zx, x.shape, dtype=x.dtype)
            mean_x, std_x = sde["x"].marginal_prob(x, t)
            pert_x = mean_x + batch_mul(std_x, z_x)

            score = score_fn({"x": pert_x, "y": pert_y}, t)
            g2_y, g2_x = _g2(sde["y"], t), _g2(sde["x"], t)

            losses_y = flatten_batch(
                batch_mul(g2_y, (score["y"] + batch_mul(1.0 / std_y, z_y)) ** 2)
            )
            losses_x = flatten_batch(
                batch_mul(g2_x, (score["x"] + batch_mul(1.0 / std_x, z_x)) ** 2)
            )
            losses = jnp.concatenate([losses_x, losses_y], axis=-1)
            losses = jnp.mean(losses, -1) if reduce_mean else 0.5 * jnp.sum(losses, -1)
            return jnp.mean(losses)

        return loss_fn

    if conditional and isinstance(sde, dict):
        # Multi-speed diffusion, ≥3 SDEs (losses.py:103-137)
        assert likelihood_weighting, "multi-speed requires likelihood weighting"

        def loss_fn(params, batch, rng):
            keys = sorted(batch.keys())
            rng_t, rng_drop, *rngs_z = jax.random.split(rng, 2 + len(keys))
            score_fn = get_score_fn(
                sde, model, params, conditional=True, train=train,
                continuous=continuous, rngs={"dropout": rng_drop},
            )
            b0 = batch[keys[0]]
            t = jax.random.uniform(
                rng_t, (b0.shape[0],), dtype=b0.dtype,
                minval=eps, maxval=sde[keys[0]].T,
            )
            perturbed, noise, stds = {}, {}, {}
            for key, rz in zip(keys, rngs_z):
                z = jax.random.normal(rz, batch[key].shape, dtype=batch[key].dtype)
                mean, std = sde[key].marginal_prob(batch[key], t)
                perturbed[key] = mean + batch_mul(std, z)
                noise[key], stds[key] = z, std
            score = score_fn(perturbed, t)
            per_domain = []
            for key in keys:
                g2 = _g2(sde[key], t)
                l = batch_mul(
                    g2,
                    (score[key] + batch_mul(1.0 / stds[key], noise[key])) ** 2,
                )
                per_domain.append(flatten_batch(l))
            losses = jnp.concatenate(per_domain, axis=-1)
            losses = jnp.mean(losses, -1) if reduce_mean else 0.5 * jnp.sum(losses, -1)
            return jnp.mean(losses)

        return loss_fn

    if conditional:
        # SR3 estimator: clean condition y, diffuse x only (losses.py:139-160)
        def loss_fn(params, batch, rng):
            y, x = batch
            rng_t, rng_z, rng_drop = jax.random.split(rng, 3)
            score_fn = get_score_fn(
                sde, model, params, conditional=True, train=train,
                continuous=continuous, rngs={"dropout": rng_drop},
            )
            t = jax.random.uniform(
                rng_t, (x.shape[0],), dtype=x.dtype, minval=eps, maxval=sde.T
            )
            z = jax.random.normal(rng_z, x.shape, dtype=x.dtype)
            mean, std = sde.marginal_prob(x, t)
            perturbed = {"x": mean + batch_mul(std, z), "y": y}
            score = score_fn(perturbed, t)
            if not likelihood_weighting:
                losses = _reduce((batch_mul(std, score) + z) ** 2, reduce_mean)
            else:
                g2 = _g2(sde, t)
                losses = _reduce(
                    (score + batch_mul(1.0 / std, z)) ** 2, reduce_mean
                ) * g2
            return jnp.mean(losses)

        return loss_fn

    # --- unconditional (losses.py:163-188) ---------------------------------
    def loss_fn(params, batch, rng):
        rng_t, rng_z, rng_drop = jax.random.split(rng, 3)
        score_fn = get_score_fn(
            sde, model, params, conditional=False, train=train,
            continuous=continuous, rngs={"dropout": rng_drop},
        )
        t = jax.random.uniform(
            rng_t, (batch.shape[0],), dtype=batch.dtype, minval=eps, maxval=sde.T
        )
        z = jax.random.normal(rng_z, batch.shape, dtype=batch.dtype)
        mean, std = sde.marginal_prob(batch, t)
        perturbed = mean + batch_mul(std, z)
        score = score_fn(perturbed, t)

        if not likelihood_weighting:
            losses = _reduce((batch_mul(std, score) + z) ** 2, reduce_mean)
        else:
            g2 = _g2(sde, t)
            losses = _reduce((score + batch_mul(1.0 / std, z)) ** 2, reduce_mean) * g2
        return jnp.mean(losses)

    return loss_fn
