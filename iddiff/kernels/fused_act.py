"""fused_bias_act: bias-add + LeakyReLU + scale as one Pallas TPU kernel.

TPU-native equivalent of the reference CUDA kernel
(/root/reference/op/fused_bias_act_kernel.cu:36-98 + op/fused_act.py:20-97).
The op is a named Pallas kernel (one VMEM pass, VPU elementwise) with a
`jax.custom_vjp` mirroring the reference's hand-written grad/double-grad
structure (fused_act.py:20-71); a pure-lax reference path is used on
non-TPU backends and in tests (mirroring the CPU fallback,
fused_act.py:86-97).

Layout: channel-last (..., C); bias has shape (C,).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _lax_fused_leaky_relu(x, bias, negative_slope, scale):
    y = x + bias.reshape((1,) * (x.ndim - 1) + (-1,))
    return jnp.where(y >= 0, y, negative_slope * y) * scale


def _pallas_fused_leaky_relu(x, bias, negative_slope, scale):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    orig_shape = x.shape
    c = x.shape[-1]
    x2 = x.reshape(-1, c)

    def kernel(x_ref, b_ref, o_ref):
        y = x_ref[:] + b_ref[:][None, :]
        o_ref[:] = jnp.where(y >= 0, y, negative_slope * y) * scale

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x2.shape, x2.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x2, bias.astype(x2.dtype))
    return out.reshape(orig_shape)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_leaky_relu(x, bias, negative_slope: float = 0.2,
                     scale: float = 2**0.5):
    """y = scale · leaky_relu(x + bias)  (op/fused_act.py:74-97)."""
    if jax.devices()[0].platform == "tpu":
        return _pallas_fused_leaky_relu(x, bias, negative_slope, scale)
    return _lax_fused_leaky_relu(x, bias, negative_slope, scale)


def _flr_fwd(x, bias, negative_slope, scale):
    out = fused_leaky_relu(x, bias, negative_slope, scale)
    # residual: sign of the pre-activation, like the reference which saves
    # the output's sign via `out` (fused_act.py:29-38)
    mask = (x + bias.reshape((1,) * (x.ndim - 1) + (-1,))) >= 0
    return out, mask


def _flr_bwd(negative_slope, scale, mask, g):
    grad = jnp.where(mask, g, negative_slope * g) * scale
    grad_bias = grad.reshape(-1, grad.shape[-1]).sum(axis=0)
    return grad, grad_bias


fused_leaky_relu.defvjp(_flr_fwd, _flr_bwd)
