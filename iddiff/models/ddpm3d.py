"""3-D convolutional DDPM U-Net for volumetric data.

Behavioral rebuild of /root/reference/models/ddpm3D.py:38-182 in Flax with
NDHWC layout: same plan as the 2-D DDPM (no attention), conv kernels
(3,3,3), conv-shortcut resblocks, nearest ×2 resampling on (D,H,W).
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from iddiff.nn import (
    GroupNorm,
    default_init,
    get_act,
    get_timestep_embedding,
)

from .registry import register_model


def conv3x3x3(out_ch, *, init_scale=1.0):
    return nn.Conv(out_ch, (3, 3, 3), padding="SAME",
                   kernel_init=default_init(init_scale),
                   bias_init=nn.initializers.zeros)


class ResnetBlock3D(nn.Module):
    act: Any
    out_ch: Optional[int] = None
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, temb=None, *, train: bool = False):
        C = x.shape[-1]
        out_ch = self.out_ch or C
        h = GroupNorm(num_groups=min(C // 4, 32), epsilon=1e-6,
                      act=self.act)(x)
        h = conv3x3x3(out_ch)(h)
        if temb is not None:
            h = h + nn.Dense(out_ch, kernel_init=default_init())(
                self.act(temb)
            )[:, None, None, None, :]
        h = GroupNorm(num_groups=min(out_ch // 4, 32), epsilon=1e-6,
                      act=self.act)(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = conv3x3x3(out_ch, init_scale=0.0)(h)
        if C != out_ch:
            x = conv3x3x3(out_ch)(x)  # conv_shortcut=True (ddpm3D.py:53)
        return x + h


class Downsample3D(nn.Module):
    with_conv: bool = True

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        if self.with_conv:
            x = jnp.pad(x, [(0, 0), (0, 1), (0, 1), (0, 1), (0, 0)])
            return nn.Conv(C, (3, 3, 3), strides=(2, 2, 2), padding="VALID",
                           kernel_init=default_init())(x)
        return nn.avg_pool(x, (2, 2, 2), strides=(2, 2, 2))


class Upsample3D(nn.Module):
    with_conv: bool = True

    @nn.compact
    def __call__(self, x):
        B, D, H, W, C = x.shape
        h = jax.image.resize(x, (B, D * 2, H * 2, W * 2, C), method="nearest")
        if self.with_conv:
            h = conv3x3x3(C)(h)
        return h


@register_model(name="ddpm3D")
class DDPM3D(nn.Module):
    """(ddpm3D.py:38-168)"""

    config: object

    @nn.compact
    def __call__(self, x, labels, *, train: bool = False):
        config = self.config
        act = get_act(config)
        nf = config.model.nf
        ch_mult = tuple(config.model.ch_mult)
        num_res_blocks = config.model.num_res_blocks
        dropout = config.model.get("dropout", 0.0)
        resamp_with_conv = config.model.get("resamp_with_conv", True)
        num_resolutions = len(ch_mult)
        conditional = config.model.get("conditional", True)
        channels = config.data.num_channels

        if conditional:
            temb = get_timestep_embedding(labels, nf)
            temb = nn.Dense(nf * 4, kernel_init=default_init())(temb)
            temb = nn.Dense(nf * 4, kernel_init=default_init())(act(temb))
        else:
            temb = None

        h = x if config.data.get("centered", False) else 2 * x - 1.0
        block = lambda out_ch: ResnetBlock3D(act=act, out_ch=out_ch,
                                             dropout=dropout)

        hs = [conv3x3x3(nf)(h)]
        for i_level in range(num_resolutions):
            for _ in range(num_res_blocks):
                h = block(nf * ch_mult[i_level])(hs[-1], temb, train=train)
                hs.append(h)
            if i_level != num_resolutions - 1:
                hs.append(Downsample3D(with_conv=resamp_with_conv)(hs[-1]))

        h = hs[-1]
        h = block(None)(h, temb, train=train)
        h = block(None)(h, temb, train=train)

        for i_level in reversed(range(num_resolutions)):
            for _ in range(num_res_blocks + 1):
                h = block(nf * ch_mult[i_level])(
                    jnp.concatenate([h, hs.pop()], axis=-1), temb, train=train
                )
            if i_level != 0:
                h = Upsample3D(with_conv=resamp_with_conv)(h)
        assert not hs

        C = h.shape[-1]
        h = GroupNorm(num_groups=min(C // 4, 32), epsilon=1e-6, act=act)(h)
        return conv3x3x3(channels, init_scale=0.0)(h)


@register_model(name="ddpm3D_paired")
class DDPM3DPaired(DDPM3D):
    """(ddpm3D.py:172-182)"""

    def __call__(self, batch, labels, *, train: bool = False):
        x, y = batch["x"], batch["y"]
        xc = x.shape[-1]
        out = super().__call__(
            jnp.concatenate([x, y], axis=-1), labels, train=train
        )
        return {"x": out[..., :xc], "y": out[..., xc:]}
