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

    def scalars_fn(epoch):
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

    def scalars_fn(epoch):
        if adaptive:
            w = lam * epoch / config.training.num_epochs
        else:
            w = lam
        return jnp.asarray([w], jnp.float32)

    return train_loss, dsm_eval, scalars_fn


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
