"""RefineNet building blocks for NCSNv1/v2 (Flax, NHWC).

Behavioral rebuild of /root/reference/models/layers.py:141-520 (CRP/RCU/MSF/
RefineBlock, ConvMeanPool/MeanPoolConv/UpsampleConv, ResidualBlock and their
class-conditional variants).  Bilinear resizes use jax.image.resize
(half-pixel centers) where the reference used align_corners=True — a
boundary-only difference.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import default_init
from .normalization import InstanceNorm2dPlus


def ncsn_conv3x3(out_ch, *, stride=1, bias=True, dilation=1):
    return nn.Conv(
        out_ch, (3, 3), strides=(stride, stride), padding="SAME",
        use_bias=bias, kernel_dilation=(dilation, dilation),
        kernel_init=default_init(),
    )


def ncsn_conv1x1(out_ch, *, bias=True):
    return nn.Conv(out_ch, (1, 1), use_bias=bias, kernel_init=default_init())


def _mean_pool2x(x):
    """2× mean pool by 4-phase averaging (layers.py:375-378), NHWC."""
    return (
        x[:, ::2, ::2] + x[:, 1::2, ::2] + x[:, ::2, 1::2] + x[:, 1::2, 1::2]
    ) / 4.0


class ConvMeanPool(nn.Module):
    """conv3x3 → 2× mean pool (layers.py:359-378)."""

    out_ch: int
    kernel_size: int = 3
    bias: bool = True
    adjust_padding: bool = False

    @nn.compact
    def __call__(self, x):
        if self.adjust_padding:
            x = jnp.pad(x, [(0, 0), (1, 0), (1, 0), (0, 0)])
            conv = nn.Conv(
                self.out_ch, (self.kernel_size, self.kernel_size),
                padding="VALID" if self.kernel_size == 1 else
                [(self.kernel_size // 2,) * 2] * 2,
                use_bias=self.bias, kernel_init=default_init(),
            )
        else:
            conv = nn.Conv(
                self.out_ch, (self.kernel_size, self.kernel_size),
                padding="SAME", use_bias=self.bias, kernel_init=default_init(),
            )
        return _mean_pool2x(conv(x))


class MeanPoolConv(nn.Module):
    """2× mean pool → conv (layers.py:380-390)."""

    out_ch: int
    kernel_size: int = 3
    bias: bool = True

    @nn.compact
    def __call__(self, x):
        x = _mean_pool2x(x)
        return nn.Conv(
            self.out_ch, (self.kernel_size, self.kernel_size), padding="SAME",
            use_bias=self.bias, kernel_init=default_init(),
        )(x)


class UpsampleConv(nn.Module):
    """4× channel replicate → pixel-shuffle ×2 → conv (layers.py:392-403)."""

    out_ch: int
    kernel_size: int = 3
    bias: bool = True

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        # replicating the channel 4x then pixel-shuffling equals nearest 2x
        h = jax.image.resize(x, (B, H * 2, W * 2, C), method="nearest")
        return nn.Conv(
            self.out_ch, (self.kernel_size, self.kernel_size), padding="SAME",
            use_bias=self.bias, kernel_init=default_init(),
        )(h)


class CRPBlock(nn.Module):
    """Chained residual pooling (layers.py:141-163)."""

    n_stages: int = 2
    act: Any = nn.relu
    maxpool: bool = True

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        x = self.act(x)
        path = x
        pool = nn.max_pool if self.maxpool else nn.avg_pool
        for _ in range(self.n_stages):
            path = pool(path, (5, 5), strides=(1, 1), padding="SAME")
            path = ncsn_conv3x3(C, bias=False)(path)
            x = path + x
        return x


class RCUBlock(nn.Module):
    """Residual conv units (layers.py:191-213)."""

    n_blocks: int = 2
    n_stages: int = 2
    act: Any = nn.relu

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        for _ in range(self.n_blocks):
            residual = x
            for _ in range(self.n_stages):
                x = ncsn_conv3x3(C, bias=False)(self.act(x))
            x = x + residual
        return x


class MSFBlock(nn.Module):
    """Multi-scale fusion: conv each input, bilinear-resize to `shape`, sum
    (layers.py:242-259)."""

    features: int

    @nn.compact
    def __call__(self, xs, shape):
        B = xs[0].shape[0]
        out = jnp.zeros((B, shape[0], shape[1], self.features), xs[0].dtype)
        for x in xs:
            h = ncsn_conv3x3(self.features, bias=True)(x)
            h = jax.image.resize(
                h, (B, shape[0], shape[1], self.features), method="bilinear"
            )
            out = out + h
        return out


class RefineBlock(nn.Module):
    """RefineNet block: per-input RCU → MSF → CRP → output RCU
    (layers.py:285-319)."""

    features: int
    act: Any = nn.relu
    start: bool = False
    end: bool = False
    maxpool: bool = True

    @nn.compact
    def __call__(self, xs, output_shape):
        hs = [RCUBlock(2, 2, self.act)(x) for x in xs]
        if len(xs) > 1:
            h = MSFBlock(self.features)(hs, output_shape)
        else:
            h = hs[0]
            if h.shape[-1] != self.features or h.shape[1:3] != tuple(output_shape):
                h = MSFBlock(self.features)([h], output_shape)
        h = CRPBlock(2, self.act, maxpool=self.maxpool)(h)
        return RCUBlock(3 if self.end else 1, 2, self.act)(h)


class ResidualBlock(nn.Module):
    """NCSN residual block with optional down-resample/dilation
    (layers.py:462-520)."""

    out_ch: int
    resample: Optional[str] = None
    act: Any = nn.elu
    normalization: Any = InstanceNorm2dPlus
    adjust_padding: bool = False
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        norm = self.normalization

        h = self.act(norm()(x))
        if self.resample == "down":
            if self.dilation > 1:
                h = ncsn_conv3x3(in_ch, dilation=self.dilation)(h)
                h = self.act(norm()(h))
                h = ncsn_conv3x3(self.out_ch, dilation=self.dilation)(h)
                shortcut = ncsn_conv3x3(self.out_ch, dilation=self.dilation)(x)
            else:
                h = ncsn_conv3x3(in_ch)(h)
                h = self.act(norm()(h))
                h = ConvMeanPool(self.out_ch, 3,
                                 adjust_padding=self.adjust_padding)(h)
                shortcut = ConvMeanPool(self.out_ch, 1,
                                        adjust_padding=self.adjust_padding)(x)
        elif self.resample is None:
            if self.dilation > 1:
                h = ncsn_conv3x3(self.out_ch, dilation=self.dilation)(h)
                h = self.act(norm()(h))
                h = ncsn_conv3x3(self.out_ch, dilation=self.dilation)(h)
                shortcut = (
                    x if self.out_ch == in_ch
                    else ncsn_conv3x3(self.out_ch, dilation=self.dilation)(x)
                )
            else:
                h = ncsn_conv3x3(self.out_ch)(h)
                h = self.act(norm()(h))
                h = ncsn_conv3x3(self.out_ch)(h)
                shortcut = x if self.out_ch == in_ch else ncsn_conv1x1(self.out_ch)(x)
        else:
            raise ValueError(f"invalid resample '{self.resample}'")
        return shortcut + h
