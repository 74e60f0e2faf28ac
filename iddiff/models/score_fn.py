"""Score-function adapter: raw network output → true score ∇_x log p_t(x).

Functional rebuild of /root/reference/models/utils.py:123-293.  Where the
reference toggles nn.Module train/eval modes, here the adapter closes over
immutable params and an explicit `train` flag / dropout RNG, so the returned
`score_fn(x, t)` is a pure function safe to jit/scan/vmap.

Sign/scale conventions (exactly the reference's):
  - unconditional VE/VP/subVP/SNR: score = -model(x, t·(N-1)) / std(t)
    (models/utils.py:238-277)
  - conditional dict {x: cVESDE, y: VESDE} and SR3-VE: score = model / std
    per domain, NO sign flip (models/utils.py:179-232, divide_by_sigmas :50-74)
  - SR3-VP: score = model / std, no flip (models/utils.py:202-219)
  - KSphereGT oracle: score = model(x, std(t)) verbatim (models/utils.py:169-175)
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from iddiff.sde import VESDE, VPSDE, SubVPSDE, SNRSDE, CVESDE
from iddiff.utils import batch_mul

from .ksphere_gt import KSphereGT, KSphereExactGT


def get_model_fn(model, params, train: bool = False, rngs=None) -> Callable:
    """Pure callable (x, labels) -> network output, closing over params.

    Mixed precision: when config.model.compute_dtype == 'bfloat16', params
    and inputs are cast to bf16 for the forward (halving HBM traffic and
    feeding the MXU native bf16) while the fp32 params stay the optimizer's
    master copy — gradients flow through the casts back to fp32.
    """
    compute_dtype = None
    cfg = getattr(model, "config", None)
    if cfg is not None:
        name = cfg.model.get("compute_dtype", None)
        if name in ("bfloat16", "bf16"):
            compute_dtype = jnp.bfloat16

    def model_fn(x, labels):
        kwargs = {}
        if rngs is not None:
            kwargs["rngs"] = rngs
        p = params
        xx = x
        if compute_dtype is not None:
            cast = lambda a: (
                a.astype(compute_dtype)
                if hasattr(a, "dtype") and a.dtype == jnp.float32 else a
            )
            p = jax.tree_util.tree_map(cast, params)
            xx = jax.tree_util.tree_map(cast, x)
        out = model.apply({"params": p}, xx, labels, train=train, **kwargs)
        if compute_dtype is not None:
            out = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.float32), out
            )
        return out

    return model_fn


def _std_of(sde, t):
    """Marginal std at time t without materializing zeros_like(x)."""
    # All our SDEs compute std independently of x; pass a scalar dummy.
    return sde.marginal_prob(jnp.zeros_like(t), t)[1]


def divide_by_sigmas(h, t, sde, continuous: bool = True):
    """Scale network output by the marginal std (models/utils.py:50-74)."""
    if isinstance(sde, dict) and isinstance(h, dict):
        out = {}
        for domain in h:
            if continuous:
                std = _std_of(sde[domain], t)
            else:
                std = sde[domain].discrete_sigma(t)
            out[domain] = batch_mul(1.0 / std, h[domain])
        return out
    if continuous:
        std = _std_of(sde, t)
    else:
        std = sde.discrete_sigma(t)
    return batch_mul(1.0 / std, h)


def get_score_fn(sde, model, params, conditional: bool = False,
                 train: bool = False, continuous: bool = True, rngs=None):
    """Build the true score function for (sde, model, params)."""
    model_fn = get_model_fn(model, params, train=train, rngs=rngs)

    # --- analytic oracle (models/utils.py:169-175) -------------------------
    if isinstance(model, (KSphereGT, KSphereExactGT)):
        def score_fn(x, t):
            std = _std_of(sde, t)
            return model_fn(x, std)

        return score_fn

    if conditional:
        if isinstance(sde, dict):
            # multi-SDE inverse problems {x: cVESDE, y: VESDE}
            # (models/utils.py:184-197)
            if not (isinstance(sde["x"], CVESDE) and isinstance(sde["y"], VESDE)):
                raise NotImplementedError(
                    "Only {x: cVESDE, y: VESDE} conditional SDE dicts supported"
                )
            N = sde["x"].N

            def score_fn(x, t):
                if continuous:
                    labels = t * (N - 1)
                    score = model_fn(x, labels)
                    return divide_by_sigmas(score, t, sde, continuous=True)
                labels = jnp.round(t * (N - 1)).astype(jnp.int32)
                score = model_fn(x, labels)
                return divide_by_sigmas(score, labels, sde, continuous=False)

            return score_fn

        # SR3 estimator: single SDE, x is a dict {'x': ..., 'y': ...}
        if isinstance(sde, (VPSDE, SubVPSDE)):
            def score_fn(x, t):
                labels = t * (sde.N - 1)
                score = model_fn(x, labels)
                if continuous or isinstance(sde, SubVPSDE):
                    std = _std_of(sde, t)
                else:
                    std = sde.sqrt_1m_alphas_cumprod[labels.astype(jnp.int32)]
                return batch_mul(1.0 / std, score)

            return score_fn

        if isinstance(sde, (VESDE, CVESDE)):
            def score_fn(x, t):
                if continuous:
                    labels = t * (sde.N - 1)
                    score = model_fn(x, labels)
                    return divide_by_sigmas(score, t, sde, continuous=True)
                labels = jnp.round(t * (sde.N - 1)).astype(jnp.int32)
                score = model_fn(x, labels)
                return divide_by_sigmas(score, labels, sde, continuous=False)

            return score_fn

        raise NotImplementedError(f"SDE {type(sde).__name__} unsupported")

    # --- unconditional ------------------------------------------------------
    if isinstance(sde, (VPSDE, SubVPSDE)):
        def score_fn(x, t):
            labels = t * (sde.N - 1)
            score = model_fn(x, labels)
            if continuous or isinstance(sde, SubVPSDE):
                std = _std_of(sde, t)
            else:
                std = sde.sqrt_1m_alphas_cumprod[labels.astype(jnp.int32)]
            return -batch_mul(1.0 / std, score)

        return score_fn

    if isinstance(sde, (VESDE, CVESDE, SNRSDE)):
        def score_fn(x, t):
            assert continuous, "discrete VE score not supported (parity with ref)"
            labels = t * (sde.N - 1)
            score = model_fn(x, labels)
            std = _std_of(sde, t)
            return -batch_mul(1.0 / std, score)

        return score_fn

    raise NotImplementedError(f"SDE {type(sde).__name__} unsupported")


def get_conditional_score_fn(score_fn, target_domain: str = "x"):
    """(x, y, t) -> score of target domain (models/utils.py:285-293)."""

    def conditional_score_fn(x, y, t):
        score = score_fn({"x": x, "y": y}, t)
        if isinstance(score, dict):
            return score[target_domain]
        return score

    return conditional_score_fn
