"""CSDI-style conditional score transformer for time-series imputation.

Behavioral rebuild of /root/reference/models/csdi.py:10-222 in Flax:
WaveNet-style gated residual blocks whose features pass through a temporal
transformer (attention over the time axis per feature) and a feature
transformer (attention over the feature axis per step), conditioned on a
side-info tensor (sinusoidal time embedding + learned feature embedding +
mask) and a Gaussian-Fourier diffusion embedding.

Layout: internal tensors are (B, K, L, C) — channel-last so the attention
and 1×1 convs are plain batched matmuls on the MXU.
Input contract matches the reference forward (csdi.py:175-196):
  batch = {'x': (B, L_2, K) target window,
           'y': {'input': (B, L_1, K), 'timesteps': (B, L)}}
  output: score of shape (B, L_2, K).
"""
from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .registry import register_model


class TransformerEncoderLayer(nn.Module):
    """post-LN encoder layer: MHA + 64-wide gelu FFN (csdi.py:10-14)."""

    channels: int
    heads: int = 8

    @nn.compact
    def __call__(self, x):
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, qkv_features=self.channels
        )(x, x)
        x = nn.LayerNorm()(x + h)
        h = nn.Dense(64)(x)
        h = nn.gelu(h)
        h = nn.Dense(self.channels)(h)
        return nn.LayerNorm()(x + h)


class FourierDiffusionEmbedding(nn.Module):
    """Gaussian Fourier noise-level embedding + 2-layer silu MLP
    (csdi.py:22-38)."""

    embedding_dim: int = 128
    scale: float = 1.0

    @nn.compact
    def __call__(self, t):
        w = self.param(
            "W",
            lambda k, s: jax.random.normal(k, s) * self.scale,
            (self.embedding_dim // 2,),
        )
        w = jax.lax.stop_gradient(w)
        proj = t[:, None] * w[None, :] * 2 * jnp.pi
        h = jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)
        h = nn.silu(nn.Dense(self.embedding_dim)(h))
        return nn.silu(nn.Dense(self.embedding_dim)(h))


def sinusoidal_position_embedding(pos, d_model: int = 128):
    """(csdi.py:96-102); pos: (B, L) → (B, L, d_model)."""
    div = 1.0 / jnp.power(
        10000.0, jnp.arange(0, d_model, 2, dtype=jnp.float32) / d_model
    )
    ang = pos[..., None] * div[None, None, :]
    pe = jnp.stack([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    return pe.reshape(pos.shape + (d_model,))


class CSDIResidualBlock(nn.Module):
    """(csdi.py:105-160); x: (B, K, L, C), side: (B, K, L, side_dim)."""

    channels: int
    nheads: int

    @nn.compact
    def __call__(self, x, side_info, diffusion_emb):
        B, K, L, C = x.shape
        y = x + nn.Dense(self.channels)(diffusion_emb)[:, None, None, :]

        # temporal transformer: attend over L for each (B, K)
        y = TransformerEncoderLayer(self.channels, self.nheads, name="time")(
            y.reshape(B * K, L, C)
        ).reshape(B, K, L, C)
        # feature transformer: attend over K for each (B, L)
        y = y.transpose(0, 2, 1, 3).reshape(B * L, K, C)
        y = TransformerEncoderLayer(self.channels, self.nheads, name="feature")(y)
        y = y.reshape(B, L, K, C).transpose(0, 2, 1, 3)

        y = nn.Dense(2 * self.channels)(y)
        y = y + nn.Dense(2 * self.channels)(side_info)
        gate, filt = jnp.split(y, 2, axis=-1)
        y = jax.nn.sigmoid(gate) * jnp.tanh(filt)
        y = nn.Dense(2 * self.channels)(y)
        residual, skip = jnp.split(y, 2, axis=-1)
        return (x + residual) / math.sqrt(2.0), skip


@register_model(name="csdi_conditional")
class CSDI(nn.Module):
    """(csdi.py:161-222)"""

    config: object

    @nn.compact
    def __call__(self, batch, t, *, train: bool = False):
        config = self.config
        m = config.model
        L_1, L_2 = config.data.L_1, config.data.L_2
        L = L_1 + L_2
        K = config.data.shape[1]
        channels = m.num_channels

        labels = batch["x"]  # (B, L_2, K)
        y = batch["y"]
        if isinstance(y, dict):
            inpt = y["input"]  # (B, L_1, K)
            timesteps = y["timesteps"]  # (B, L)
        else:
            # array condition (the framework's (cond, target) loaders):
            # timesteps default to the window's integer grid
            inpt = y
            timesteps = jnp.broadcast_to(
                jnp.arange(L, dtype=jnp.float32)[None], (y.shape[0], L)
            )
        B = inpt.shape[0]

        observed = jnp.concatenate([inpt, labels], axis=1)  # (B, L, K)
        observed = observed.transpose(0, 2, 1)  # (B, K, L)
        mask = jnp.concatenate(
            [jnp.ones((B, K, L_1)), jnp.zeros((B, K, L_2))], axis=2
        ).astype(observed.dtype)
        condition = mask * observed
        target = (1 - mask) * observed
        x = jnp.stack([condition, target], axis=-1)  # (B, K, L, 2)

        # side info: time embedding + feature embedding + (B, K, L, *)
        time_embed = sinusoidal_position_embedding(
            timesteps, m.time_embedding_dim
        )  # (B, L, emb)
        time_embed = jnp.broadcast_to(
            time_embed[:, None], (B, K, L, m.time_embedding_dim)
        )
        feat = nn.Embed(K, m.feature_embedding_dim)(jnp.arange(K))  # (K, emb)
        feat = jnp.broadcast_to(
            feat[None, :, None, :], (B, K, L, m.feature_embedding_dim)
        )
        side_info = jnp.concatenate([time_embed, feat], axis=-1)

        h = nn.relu(nn.Dense(channels)(x))
        diff_emb = FourierDiffusionEmbedding(m.diff_embedding_dim)(t)

        skips = []
        for i in range(m.num_layers):
            h, skip = CSDIResidualBlock(
                channels, m.nheads, name=f"res{i}"
            )(h, side_info, diff_emb)
            skips.append(skip)
        h = sum(skips) / math.sqrt(len(skips))  # (B, K, L, C)

        h = nn.relu(nn.Dense(channels)(h))
        h = nn.Dense(1, kernel_init=nn.initializers.zeros)(h)  # (B, K, L, 1)
        h = h.reshape(B, K * L)
        # reference: Linear(K·L → L_2) → reshape (B, K, L_2) (csdi.py:55,94) —
        # which is only shape-consistent for K == 1; generalized here to a
        # Linear(K·L → K·L_2) head with identical behavior at K == 1.
        h = nn.Dense(K * L_2)(h).reshape(B, K, L_2)
        return h.transpose(0, 2, 1)  # (B, L_2, K)
