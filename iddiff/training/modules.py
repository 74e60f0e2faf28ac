"""Training-module flavors — the lightning_modules registry, functionally.

Rebuild of /root/reference/lightning_modules/ (SURVEY.md §2.8).  Each flavor
is a loss-builder returning (train_loss_fn, eval_loss_fn, scalars_fn):
  - train_loss_fn(params, batch, rng, scalars) -> scalar (jit/grad-safe)
  - scalars_fn(epoch) -> host float vector of epoch-dependent weights,
    passed as TRACED args so schedules never recompile.

Flavors:
  base            BaseSdeGenerativeModel.py:13-111 (plain DSM)
  fokker-planck   FokkerPlanckModel.py:62-155 (DSM + w(epoch)·FP residual)
  curl_penalty    ConservativeSdeGenerativeModel.py:17-67 (DSM + λ·curl)
  ksphere_gt      KSphereGroundTruthModel.py:14-75 (constant dummy loss so
                  the oracle runs through the training plumbing)
  conditional     ConditionalSdeGenerativeModel.py:12-129 (two-SDE / SR3)
"""
from __future__ import annotations

import jax.numpy as jnp

from iddiff.losses import get_sde_loss_fn
from iddiff.losses.curl import get_curl_penalty_fn
from iddiff.losses.fokker_planck import fp_weight_schedule, get_fp_loss_fn
from iddiff.utils import Registry

TRAINING_MODULES = Registry("training module")
register_training_module = TRAINING_MODULES.register


def build_module_losses(config, sde, model, eps):
    name = config.training.get("lightning_module", "base")
    return TRAINING_MODULES.get(name)(config, sde, model, eps)


def _dsm_pair(config, sde, model, eps, conditional=False):
    kw = dict(
        conditional=conditional,
        reduce_mean=config.training.get("reduce_mean", False),
        continuous=config.training.get("continuous", True),
        likelihood_weighting=config.training.get("likelihood_weighting", True),
        eps=eps,
    )
    return (
        get_sde_loss_fn(sde, model, train=True, **kw),
        get_sde_loss_fn(sde, model, train=False, **kw),
    )


@register_training_module(name="base")
def base_module(config, sde, model, eps):
    train_fn, eval_fn = _dsm_pair(config, sde, model, eps)

    def train_loss(params, batch, rng, scalars=None):
        return train_fn(params, batch, rng)

    return train_loss, eval_fn, None


@register_training_module(name="conditional")
def conditional_module(config, sde, model, eps):
    train_fn, eval_fn = _dsm_pair(config, sde, model, eps, conditional=True)

    def train_loss(params, batch, rng, scalars=None):
        return train_fn(params, batch, rng)

    return train_loss, eval_fn, None


@register_training_module(name="fokker-planck")
def fokker_planck_module(config, sde, model, eps):
    dsm_train, dsm_eval = _dsm_pair(config, sde, model, eps)
    fp_fn = get_fp_loss_fn(
        sde, model, hutchinson=config.training.get("hutchinson", True),
        eps=eps, train=True,
    )

    def train_loss(params, batch, rng, scalars):
        return dsm_train(params, batch, rng) + scalars[0] * fp_fn(
            params, batch, rng
        )

    def scalars_fn(epoch, step=0):
        return jnp.asarray([fp_weight_schedule(config, epoch)], jnp.float32)

    return train_loss, dsm_eval, scalars_fn


@register_training_module(name="curl_penalty")
def curl_penalty_module(config, sde, model, eps):
    dsm_train, dsm_eval = _dsm_pair(config, sde, model, eps)
    curl_fn = get_curl_penalty_fn(
        sde, model,
        penalty_type=config.model.get("curl_penalty_type", "L2"),
        eps=eps, train=True,
    )
    lam = float(config.training.get("LAMBDA", 1.0))
    adaptive = config.training.get("adaptive", False)

    def train_loss(params, batch, rng, scalars):
        return dsm_train(params, batch, rng) + scalars[0] * curl_fn(
            params, batch, rng
        )

    def scalars_fn(epoch, step=0):
        if adaptive:
            w = lam * epoch / config.training.num_epochs
        else:
            w = lam
        return jnp.asarray([w], jnp.float32)

    return train_loss, dsm_eval, scalars_fn


@register_training_module(name="haar_multiscale")
def haar_multiscale_module(config, sde, model, eps):
    """DSM on Haar-transformed, band-permuted images
    (HaarMultiScaleSdeGenerativeModel.py:48-60): the transform is folded
    into the jitted loss instead of a host-side callback."""
    from iddiff.nn.haar import haar_forward

    train_fn, eval_fn = _dsm_pair(config, sde, model, eps)

    def train_loss(params, batch, rng, scalars=None):
        return train_fn(params, haar_forward(batch), rng)

    def eval_loss(params, batch, rng):
        return eval_fn(params, haar_forward(batch), rng)

    return train_loss, eval_loss, None


def get_reduction_fn(y0, xk, yk):
    """Inverse-multiplicative decay from y0 to yk over xk steps
    (lightning_callbacks/callbacks.py:106-111)."""

    def f(x):
        return xk * yk * y0 / (x * (y0 - yk) + xk * yk)

    return f


def _decreasing_variance_builder(config, sde, model, eps, use_haar: bool):
    """Two-SDE conditional DSM where the conditioning SDE's (σ_min_y,
    σ_max_y) are TRACED per-step scalars annealed by the inverse-
    multiplicative schedule — replacing the reference's per-batch SDE
    reconstruction (callbacks.py:48-104,
    ConditionalSdeGenerativeModel.py:130-215)."""
    import jax

    from iddiff.models import get_score_fn
    from iddiff.utils import batch_mul, flatten_batch

    sde_x = sde["x"] if isinstance(sde, dict) else sde
    reduce_mean = config.training.get("reduce_mean", False)
    m = config.model

    smax_fn = get_reduction_fn(
        y0=m.sigma_max_y, xk=m.reach_target_steps, yk=m.sigma_max_y_target
    )
    smin_fn = get_reduction_fn(
        y0=m.sigma_min_y, xk=m.reach_target_steps, yk=m.sigma_min_y_target
    )

    def make_loss(train):
        def loss_fn(params, batch, rng, scalars=None):
            if scalars is None:
                scalars = jnp.asarray([m.sigma_min_y, m.sigma_max_y])
            sigma_min_y, sigma_max_y = scalars[0], scalars[1]
            y, x = batch
            if use_haar:
                from iddiff.nn.haar import dc_coefficients, hf_coefficients

                # condition on the DC band, diffuse the HF bands
                y = dc_coefficients(y)
            rng_t, rng_zy, rng_zx, rng_drop = jax.random.split(rng, 4)
            score_fn = get_score_fn(
                sde, model, params, conditional=True, train=train,
                continuous=True, rngs={"dropout": rng_drop},
            )
            t = jax.random.uniform(
                rng_t, (x.shape[0],), dtype=x.dtype,
                minval=eps, maxval=sde_x.T,
            )
            # y-branch with traced sigmas (VESDE closed forms)
            std_y = sigma_min_y * (sigma_max_y / sigma_min_y) ** t
            g2_y = std_y**2 * 2 * jnp.log(sigma_max_y / sigma_min_y)
            z_y = jax.random.normal(rng_zy, y.shape, dtype=y.dtype)
            pert_y = y + batch_mul(std_y, z_y)

            z_x = jax.random.normal(rng_zx, x.shape, dtype=x.dtype)
            mean_x, std_x = sde_x.marginal_prob(x, t)
            pert_x = mean_x + batch_mul(std_x, z_x)
            g2_x = sde_x.sde(jnp.zeros_like(t), t)[1] ** 2

            score = score_fn({"x": pert_x, "y": pert_y}, t)
            l_y = flatten_batch(
                batch_mul(g2_y, (score["y"] + batch_mul(1.0 / std_y, z_y)) ** 2)
            )
            l_x = flatten_batch(
                batch_mul(g2_x, (score["x"] + batch_mul(1.0 / std_x, z_x)) ** 2)
            )
            losses = jnp.concatenate([l_x, l_y], axis=-1)
            losses = (
                jnp.mean(losses, -1) if reduce_mean else 0.5 * jnp.sum(losses, -1)
            )
            return jnp.mean(losses)

        return loss_fn

    train_loss = make_loss(True)
    eval_raw = make_loss(False)

    def eval_loss(params, batch, rng):
        return eval_raw(params, batch, rng, None)

    def scalars_fn(epoch, step=0):
        return jnp.asarray(
            [smin_fn(step), smax_fn(step)], jnp.float32
        )

    return train_loss, eval_loss, scalars_fn


@register_training_module(name="conditional_decreasing_variance")
def conditional_decreasing_variance_module(config, sde, model, eps):
    return _decreasing_variance_builder(config, sde, model, eps, use_haar=False)


@register_training_module(name="haar_conditional_decreasing_variance")
def haar_conditional_decreasing_variance_module(config, sde, model, eps):
    return _decreasing_variance_builder(config, sde, model, eps, use_haar=True)


# legacy registry alias kept for config parity: the reference registers
# `deprecated_conditional_decreasing_variance`
# (ConditionalSdeGenerativeModel.py:81) though no shipped config uses it
@register_training_module(name="deprecated_conditional_decreasing_variance")
def deprecated_conditional_decreasing_variance_module(config, sde, model, eps):
    return _decreasing_variance_builder(config, sde, model, eps, use_haar=False)


@register_training_module(name="ksphere_gt")
def ksphere_gt_module(config, sde, model, eps):
    """Constant loss 42 with a vanishing real gradient path through the dummy
    param (KSphereGroundTruthModel.py:30-38) — lets the whole training stack
    run with the analytic oracle."""

    def const_loss(params, batch, rng, scalars=None):
        import jax

        dummy = jax.tree_util.tree_leaves(params)[0]
        return 42.0 + 0.0 * jnp.sum(dummy)

    def const_eval(params, batch, rng):
        return jnp.asarray(42.0)

    return const_loss, const_eval, None
