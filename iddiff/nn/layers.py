"""Flax layer library for the score U-Nets (NHWC, MXU-friendly).

Behavioral rebuild of /root/reference/models/layers.py (674 LoC) +
models/layerspp.py (274 LoC): time embeddings, DDPM-initialized convs, NIN,
attention blocks, FIR/plain resampling, and the DDPM / BigGAN residual
blocks.  Everything is channel-last; attention over H·W flattens to a
single batched matmul pair (einsum) so the MXU sees large contractions.
"""
from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from iddiff.kernels import (
    attention,
    conv_downsample_blur,
    downsample_2d,
    upsample_2d,
)
from iddiff.nn.normalization import GroupNorm


def get_act(config):
    """(layers.py:29-41)"""
    name = config.model.get("nonlinearity", "swish").lower()
    if name == "elu":
        return nn.elu
    if name == "relu":
        return nn.relu
    if name in ("swish", "silu"):
        return nn.swish
    if name == "lrelu":
        return lambda x: nn.leaky_relu(x, negative_slope=0.2)
    raise NotImplementedError(f"activation '{name}' unknown")


def default_init(scale: float = 1.0):
    """DDPM variance-scaling init, fan_avg/uniform (layers.py:54-91)."""
    scale = 1e-10 if scale == 0 else scale
    return nn.initializers.variance_scaling(scale, "fan_avg", "uniform")


def conv3x3(out_ch, *, stride=1, bias=True, dilation=1, init_scale=1.0):
    return nn.Conv(
        out_ch, (3, 3), strides=(stride, stride), padding="SAME",
        use_bias=bias, kernel_dilation=(dilation, dilation),
        kernel_init=default_init(init_scale),
        bias_init=nn.initializers.zeros,
    )


def conv1x1(out_ch, *, stride=1, bias=True, init_scale=1.0):
    return nn.Conv(
        out_ch, (1, 1), strides=(stride, stride), padding="SAME",
        use_bias=bias, kernel_init=default_init(init_scale),
        bias_init=nn.initializers.zeros,
    )


def get_timestep_embedding(timesteps, embedding_dim: int,
                           max_positions: int = 10_000):
    """Transformer sinusoidal embedding (layers.py get_timestep_embedding)."""
    half_dim = embedding_dim // 2
    emb = math.log(max_positions) / (half_dim - 1)
    emb = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -emb)
    emb = timesteps.astype(jnp.float32)[:, None] * emb[None, :]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, [(0, 0), (0, 1)])
    return emb


class GaussianFourierProjection(nn.Module):
    """Random-feature time embedding (layerspp.py:32-41)."""

    embedding_size: int = 256
    scale: float = 1.0

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "W",
            lambda key, shape: jax.random.normal(key, shape) * self.scale,
            (self.embedding_size,),
        )
        w = jax.lax.stop_gradient(w)
        x_proj = x[:, None] * w[None, :] * 2 * jnp.pi
        return jnp.concatenate([jnp.sin(x_proj), jnp.cos(x_proj)], axis=-1)


class NIN(nn.Module):
    """1×1 channel mixing via einsum (layers.py NIN)."""

    num_units: int
    init_scale: float = 0.1

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        w = self.param("W", default_init(self.init_scale), (in_dim, self.num_units))
        b = self.param("b", nn.initializers.zeros, (self.num_units,))
        return jnp.einsum("...i,ij->...j", x, w) + b


class AttnBlock(nn.Module):
    """Channelwise self-attention over H·W (layers.py AttnBlock /
    layerspp.py AttnBlockpp:62-91 with skip_rescale)."""

    skip_rescale: bool = False
    init_scale: float = 0.0

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = GroupNorm(num_groups=min(C // 4, 32), epsilon=1e-6)(x)
        q = NIN(C)(h)
        k = NIN(C)(h)
        v = NIN(C)(h)
        q = q.reshape(B, H * W, C)
        k = k.reshape(B, H * W, C)
        v = v.reshape(B, H * W, C)
        h = attention(q, k, v).reshape(B, H, W, C)
        h = NIN(C, init_scale=self.init_scale)(h)
        if self.skip_rescale:
            return (x + h) / math.sqrt(2.0)
        return x + h


class Upsample(nn.Module):
    """Nearest (or FIR) ×2 upsample + optional conv
    (layers.py Upsample / layerspp.py:94-128)."""

    with_conv: bool = True
    fir: bool = False
    fir_kernel: tuple = (1, 3, 3, 1)
    out_ch: Optional[int] = None

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        out_ch = self.out_ch or C
        if self.fir:
            if self.with_conv:
                h = upsample_2d(x, k=list(self.fir_kernel), factor=2)
                h = conv3x3(out_ch)(h)
            else:
                h = upsample_2d(x, k=list(self.fir_kernel), factor=2)
        else:
            h = jax.image.resize(x, (B, H * 2, W * 2, C), method="nearest")
            if self.with_conv:
                h = conv3x3(out_ch)(h)
        return h


class Downsample(nn.Module):
    """Strided-conv (or FIR) ×2 downsample (layers.py Downsample /
    layerspp.py:131-163)."""

    with_conv: bool = True
    fir: bool = False
    fir_kernel: tuple = (1, 3, 3, 1)
    out_ch: Optional[int] = None

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        out_ch = self.out_ch or C
        if self.fir:
            if self.with_conv:
                # reference fused conv_downsample_2d semantics
                # (up_or_down_sampling.py:141-177): conv THEN FIR-downsample,
                # computed as one full-res FIR blur + strided VALID conv
                h = conv_downsample_blur(x, k=list(self.fir_kernel), factor=2)
                h = nn.Conv(out_ch, (3, 3), strides=(2, 2), padding="VALID",
                            kernel_init=default_init())(h)
            else:
                h = downsample_2d(x, k=list(self.fir_kernel), factor=2)
        else:
            if self.with_conv:
                # asymmetric (0,1)x(0,1) pad like the reference
                x = jnp.pad(x, [(0, 0), (0, 1), (0, 1), (0, 0)])
                h = nn.Conv(out_ch, (3, 3), strides=(2, 2), padding="VALID",
                            kernel_init=default_init())(x)
            else:
                h = nn.avg_pool(x, (2, 2), strides=(2, 2))
        return h


class ResnetBlockDDPM(nn.Module):
    """DDPM residual block (layers.py ResnetBlockDDPM /
    layerspp.py ResnetBlockDDPMpp:166-209)."""

    act: Any
    out_ch: Optional[int] = None
    conv_shortcut: bool = False
    dropout: float = 0.1
    skip_rescale: bool = False
    init_scale: float = 0.0

    @nn.compact
    def __call__(self, x, temb=None, train: bool = False):
        # `train` is positional-able so nn.remat can mark it static
        C = x.shape[-1]
        out_ch = self.out_ch or C
        h = GroupNorm(num_groups=min(C // 4, 32), epsilon=1e-6,
                      act=self.act)(x)
        h = conv3x3(out_ch)(h)
        if temb is not None:
            h = h + nn.Dense(out_ch, kernel_init=default_init())(
                self.act(temb)
            )[:, None, None, :]
        h = GroupNorm(num_groups=min(out_ch // 4, 32), epsilon=1e-6,
                      act=self.act)(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = conv3x3(out_ch, init_scale=self.init_scale)(h)
        if C != out_ch:
            if self.conv_shortcut:
                x = conv3x3(out_ch)(x)
            else:
                x = NIN(out_ch)(x)
        if self.skip_rescale:
            return (x + h) / math.sqrt(2.0)
        return x + h


class ResnetBlockBigGAN(nn.Module):
    """BigGAN-style residual block with in-block up/down sampling
    (layerspp.py ResnetBlockBigGANpp:212-274)."""

    act: Any
    out_ch: Optional[int] = None
    up: bool = False
    down: bool = False
    dropout: float = 0.1
    fir: bool = True
    fir_kernel: tuple = (1, 3, 3, 1)
    skip_rescale: bool = True
    init_scale: float = 0.0

    def _resample(self, h):
        if self.up:
            if self.fir:
                return upsample_2d(h, k=list(self.fir_kernel), factor=2)
            B, H, W, C = h.shape
            return jax.image.resize(h, (B, H * 2, W * 2, C), method="nearest")
        if self.down:
            if self.fir:
                return downsample_2d(h, k=list(self.fir_kernel), factor=2)
            return nn.avg_pool(h, (2, 2), strides=(2, 2))
        return h

    @nn.compact
    def __call__(self, x, temb=None, train: bool = False):
        # `train` positional-able so nn.remat can mark it static
        C = x.shape[-1]
        out_ch = self.out_ch or C
        h = GroupNorm(num_groups=min(C // 4, 32), epsilon=1e-6,
                      act=self.act)(x)
        if self.up or self.down:
            h = self._resample(h)
            x = self._resample(x)
        h = conv3x3(out_ch)(h)
        if temb is not None:
            h = h + nn.Dense(out_ch, kernel_init=default_init())(
                self.act(temb)
            )[:, None, None, :]
        h = GroupNorm(num_groups=min(out_ch // 4, 32), epsilon=1e-6,
                      act=self.act)(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = conv3x3(out_ch, init_scale=self.init_scale)(h)
        if C != out_ch or self.up or self.down:
            x = conv1x1(out_ch)(x)
        if self.skip_rescale:
            return (x + h) / math.sqrt(2.0)
        return x + h


class Combine(nn.Module):
    """Combine progressive-pyramid branch with the trunk (layerspp.py:44-59)."""

    out_ch: int
    method: str = "cat"

    @nn.compact
    def __call__(self, x, y):
        h = conv1x1(self.out_ch)(x)
        if self.method == "cat":
            return jnp.concatenate([h, y], axis=-1)
        if self.method == "sum":
            return h + y
        raise ValueError(f"combine method '{self.method}' unknown")
