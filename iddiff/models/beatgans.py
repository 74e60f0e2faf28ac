"""BeatGANs (diffusion-autoencoder) style U-Net.

Behavioral rebuild of /root/reference/models/BeatGANsUNET.py:18-281 (+ its
block library BeatGANsblocks.py and BeatGANs_nn.py) in Flax/NHWC.  Honors
the config surface that shapes the architecture: model_channels,
channel_mult (+ optional input_channel_mult / num_input_res_blocks),
num_res_blocks, attention_resolutions, num_heads / num_head_channels,
resblock_updown, conv_resample, dropout, num_classes (label embedding added
to the time embedding), use_scale_shift ('resnet_two_cond' conditioning
collapses to scale-shift GroupNorm conditioning in the unconditional
autoencoder-free path used here).  forward(x, t, y=None)
(BeatGANsUNET.py:235-281): per-level lateral skips concatenated on the way
up.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from iddiff.nn import GroupNorm, default_init, get_timestep_embedding
from iddiff.nn.layers import conv3x3, conv1x1

from .registry import register_model


class BGResBlock(nn.Module):
    """Two-conv residual block with scale-shift time conditioning and
    optional in-block up/down (BeatGANsblocks.py ResBlock)."""

    out_ch: int
    dropout: float = 0.0
    up: bool = False
    down: bool = False
    use_scale_shift: bool = True

    def _resample(self, h):
        B, H, W, C = h.shape
        if self.up:
            return jax.image.resize(h, (B, H * 2, W * 2, C), method="nearest")
        if self.down:
            return nn.avg_pool(h, (2, 2), strides=(2, 2))
        return h

    @nn.compact
    def __call__(self, x, emb, *, train: bool = False):
        C = x.shape[-1]
        h = GroupNorm(num_groups=min(C // 4, 32), epsilon=1e-5,
                      act=nn.silu)(x)
        if self.up or self.down:
            h = self._resample(h)
            x = self._resample(x)
        h = conv3x3(self.out_ch)(h)

        emb_out = nn.Dense(
            2 * self.out_ch if self.use_scale_shift else self.out_ch,
            kernel_init=default_init(),
        )(nn.silu(emb))[:, None, None, :]

        norm = nn.GroupNorm(num_groups=min(self.out_ch // 4, 32), epsilon=1e-5)
        if self.use_scale_shift:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = norm(h) * (1 + scale) + shift
        else:
            h = norm(h + emb_out)
        h = nn.silu(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = conv3x3(self.out_ch, init_scale=0.0)(h)

        if C != self.out_ch:
            x = conv1x1(self.out_ch)(x)
        return x + h


class BGAttention(nn.Module):
    """Multi-head attention over H·W (BeatGANsblocks.py AttentionBlock)."""

    num_heads: int = 1
    num_head_channels: int = -1

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        heads = (
            C // self.num_head_channels
            if self.num_head_channels > 0
            else self.num_heads
        )
        h = GroupNorm(num_groups=min(C // 4, 32), epsilon=1e-5)(x)
        h = h.reshape(B, H * W, C)
        h = nn.MultiHeadDotProductAttention(
            num_heads=max(heads, 1), qkv_features=C,
            out_kernel_init=nn.initializers.zeros,
        )(h, h)
        return x + h.reshape(B, H, W, C)


@register_model(name="BeatGANsUNetModel")
class BeatGANsUNetModel(nn.Module):
    """(BeatGANsUNET.py:18-281)"""

    config: object

    @nn.compact
    def __call__(self, x, t, y=None, *, train: bool = False):
        m = self.config.model
        model_ch = m.model_channels
        ch_mult = tuple(m.channel_mult)
        num_res_blocks = m.num_res_blocks
        input_ch_mult = tuple(m.get("input_channel_mult", None) or ch_mult)
        num_input_blocks = m.get("num_input_res_blocks", None) or num_res_blocks
        attn_res = tuple(m.get("attention_resolutions", ()))
        dropout = m.get("dropout", 0.0)
        resblock_updown = m.get("resblock_updown", False)
        num_heads = m.get("num_heads", 1)
        num_head_channels = m.get("num_head_channels", -1)
        num_classes = m.get("num_classes", None)
        embed_channels = m.get("embed_channels", 4 * model_ch)
        out_channels = m.get("out_channels", self.config.data.num_channels)
        resolution = m.get("image_size", self.config.data.image_size)

        # time (+ label) embedding (BeatGANsUNET.py:29-40)
        time_emb_ch = m.get("time_embed_channels", None) or model_ch
        emb = get_timestep_embedding(t, time_emb_ch)
        emb = nn.Dense(embed_channels, kernel_init=default_init())(emb)
        emb = nn.Dense(embed_channels, kernel_init=default_init())(nn.silu(emb))
        if num_classes is not None and y is not None:
            emb = emb + nn.Embed(num_classes, embed_channels)(y)

        block = lambda out_ch, **kw: BGResBlock(
            out_ch=out_ch, dropout=dropout, **kw
        )
        attn = lambda: BGAttention(num_heads=num_heads,
                                   num_head_channels=num_head_channels)

        # --- input blocks ---
        res = resolution
        h = conv3x3(int(ch_mult[0] * model_ch))(x)
        hs = [h]
        for level, mult in enumerate(input_ch_mult):
            for _ in range(num_input_blocks):
                h = block(int(mult * model_ch))(h, emb, train=train)
                if res in attn_res:
                    h = attn()(h)
                hs.append(h)
            if level != len(ch_mult) - 1:
                res //= 2
                if resblock_updown:
                    h = block(h.shape[-1], down=True)(h, emb, train=train)
                else:
                    h = jnp.pad(h, [(0, 0), (0, 1), (0, 1), (0, 0)])
                    h = nn.Conv(h.shape[-1], (3, 3), strides=(2, 2),
                                padding="VALID",
                                kernel_init=default_init())(h)
                hs.append(h)

        # --- middle ---
        h = block(h.shape[-1])(h, emb, train=train)
        h = attn()(h)
        h = block(h.shape[-1])(h, emb, train=train)

        # --- output blocks with lateral skips (BeatGANsUNET.py:188-233) ---
        for level in reversed(range(len(ch_mult))):
            for i in range(num_res_blocks + 1):
                try:
                    lateral = hs.pop()
                except IndexError:
                    lateral = None
                if lateral is not None:
                    h = jnp.concatenate([h, lateral], axis=-1)
                h = block(int(ch_mult[level] * model_ch))(h, emb, train=train)
                if res in attn_res:
                    h = attn()(h)
            if level != 0:
                res *= 2
                if resblock_updown:
                    h = block(h.shape[-1], up=True)(h, emb, train=train)
                else:
                    B, H, W, C = h.shape
                    h = jax.image.resize(h, (B, H * 2, W * 2, C),
                                         method="nearest")
                    h = conv3x3(C)(h)

        C = h.shape[-1]
        h = GroupNorm(num_groups=min(C // 4, 32), epsilon=1e-5,
                      act=nn.silu)(h)
        return conv3x3(out_channels, init_scale=0.0)(h)
