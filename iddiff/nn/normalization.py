"""Normalization layers (behavioral rebuild of /root/reference/models/normalization.py:22-215).

`get_normalization(config)` maps config.model.normalization →
GroupNorm | InstanceNorm++ | InstanceNorm | VarianceNorm (the NCSNv1/v2
family).  Conditional (class-embedded γ/β) variants take an extra label
argument.  Layout NHWC; instance statistics are over (H, W).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from iddiff.kernels.group_norm import (
    fused_groupnorm_enabled,
    group_norm_act,
    group_norm_act_reference,
)

# function objects that mean "swish" — the only activation the fused
# Pallas kernel knows how to apply in-register
_SWISH_FNS = (nn.swish, nn.silu, jax.nn.silu)


class GroupNorm(nn.Module):
    """GroupNorm with an optionally FUSED trailing activation.

    Drop-in for `act(flax.linen.GroupNorm(num_groups, epsilon)(x))` at the
    DDPM/NCSN++ block call sites: the class is deliberately named
    `GroupNorm` so flax auto-scoping produces the same `GroupNorm_N` path
    and the same `scale`/`bias` leaves as flax's module — checkpoints
    trained before the fusion restore unchanged.

    When the Pallas kernel is enabled (`IDDIFF_FUSED_GN=1` or
    `kernels.group_norm.set_fused_groupnorm(True)`) and the activation is
    swish/None on a 4D NHWC tensor, norm + affine + activation run as ONE
    HBM pass (kernels/group_norm.py); otherwise the pure-lax two-pass
    path is used (numerically the flax behavior).
    """

    num_groups: int = 32
    epsilon: float = 1e-6
    act: Any = None  # callable applied after the norm; swish is fusable

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        act_name = "swish" if any(self.act is f for f in _SWISH_FNS) \
            else None
        if (fused_groupnorm_enabled() and x.ndim == 4
                and (self.act is None or act_name)):
            return group_norm_act(
                x, scale, bias, self.num_groups, self.epsilon, act_name)
        # the rank-agnostic lax spec (fp32 statistics, like flax)
        y = group_norm_act_reference(
            x, scale, bias, self.num_groups, self.epsilon, None)
        return self.act(y) if self.act is not None else y


class InstanceNorm2d(nn.Module):
    bias: bool = True

    @nn.compact
    def __call__(self, x):
        mean = x.mean(axis=(1, 2), keepdims=True)
        var = x.var(axis=(1, 2), keepdims=True)
        h = (x - mean) / jnp.sqrt(var + 1e-5)
        C = x.shape[-1]
        gamma = self.param("gamma", nn.initializers.ones, (C,))
        h = h * gamma
        if self.bias:
            beta = self.param("beta", nn.initializers.zeros, (C,))
            h = h + beta
        return h


class VarianceNorm2d(nn.Module):
    """Scale by inverse std only (normalization.py VarianceNorm2d)."""

    bias: bool = False

    @nn.compact
    def __call__(self, x):
        var = x.var(axis=(1, 2), keepdims=True)
        h = x / jnp.sqrt(var + 1e-5)
        C = x.shape[-1]
        alpha = self.param(
            "alpha",
            lambda k, s: 1.0 + 0.02 * jax.random.normal(k, s),
            (C,),
        )
        out = h * alpha
        if self.bias:
            out = out + self.param("beta", nn.initializers.zeros, (C,))
        return out


class InstanceNorm2dPlus(nn.Module):
    """NCSN's InstanceNorm++ — re-injects the per-channel mean statistics so
    the norm does not erase global color/level information
    (normalization.py InstanceNorm2dPlus)."""

    bias: bool = True

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        means = x.mean(axis=(1, 2))  # (B, C)
        m = means.mean(axis=-1, keepdims=True)
        v = means.var(axis=-1, keepdims=True)
        means_norm = (means - m) / jnp.sqrt(v + 1e-5)  # (B, C)

        mean = x.mean(axis=(1, 2), keepdims=True)
        var = x.var(axis=(1, 2), keepdims=True)
        h = (x - mean) / jnp.sqrt(var + 1e-5)

        gamma = self.param(
            "gamma", lambda k, s: 1.0 + 0.02 * jax.random.normal(k, s), (C,)
        )
        alpha = self.param(
            "alpha", lambda k, s: 1.0 + 0.02 * jax.random.normal(k, s), (C,)
        )
        out = gamma * h + means_norm[:, None, None, :] * alpha
        if self.bias:
            out = out + self.param("beta", nn.initializers.zeros, (C,))
        return out


class ConditionalInstanceNorm2dPlus(nn.Module):
    """Class-conditional InstanceNorm++: γ/α/β looked up from a class
    embedding (normalization.py ConditionalInstanceNorm2dPlus); `y` is an
    integer label (the sigma index in NCSNv1)."""

    num_classes: int
    bias: bool = True

    @nn.compact
    def __call__(self, x, y):
        C = x.shape[-1]
        n_feat = 3 if self.bias else 2
        embed = nn.Embed(
            self.num_classes, n_feat * C,
            embedding_init=lambda k, s, d=jnp.float32: jnp.concatenate(
                [
                    1.0 + 0.02 * jax.random.normal(k, (s[0], 2 * C)),
                    jnp.zeros((s[0], s[1] - 2 * C)),
                ],
                axis=1,
            ),
        )(y)
        gamma = embed[:, :C]
        alpha = embed[:, C: 2 * C]

        means = x.mean(axis=(1, 2))
        m = means.mean(axis=-1, keepdims=True)
        v = means.var(axis=-1, keepdims=True)
        means_norm = (means - m) / jnp.sqrt(v + 1e-5)
        mean = x.mean(axis=(1, 2), keepdims=True)
        var = x.var(axis=(1, 2), keepdims=True)
        h = (x - mean) / jnp.sqrt(var + 1e-5)
        out = gamma[:, None, None, :] * h + \
            (means_norm * alpha)[:, None, None, :]
        if self.bias:
            beta = embed[:, 2 * C:]
            out = out + beta[:, None, None, :]
        return out


def get_normalization(config, conditional: bool = False):
    """(normalization.py:22-40); returns a Module CLASS to instantiate."""
    norm = config.model.get("normalization", "GroupNorm")
    if conditional:
        if norm in ("InstanceNorm++", "InstanceNorm"):
            from functools import partial

            return partial(
                ConditionalInstanceNorm2dPlus,
                num_classes=config.model.num_scales,
            )
        raise NotImplementedError(f"conditional normalization '{norm}'")
    if norm == "InstanceNorm":
        return InstanceNorm2d
    if norm == "InstanceNorm++":
        return InstanceNorm2dPlus
    if norm == "VarianceNorm":
        return VarianceNorm2d
    if norm == "GroupNorm":
        return lambda: GroupNorm(num_groups=32, epsilon=1e-6)
    raise NotImplementedError(f"normalization '{norm}' unknown")
