"""NCSN++ score U-Net (Song et al.) with progressive pyramids + FIR resampling.

Behavioral rebuild of /root/reference/models/ncsnpp.py:39-449 in Flax/NHWC.
Supports: fourier|positional time embeddings, ddpm|biggan residual blocks,
skip_rescale, FIR (upfirdn2d-backed) resampling, progressive output
('output_skip'|'residual') and progressive input ('input_skip'|'residual'),
plus the paired / 2xSR / KxSR conditional variants (ncsnpp.py:390-449).
"""
from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from iddiff.nn import (
    AttnBlock,
    Combine,
    Downsample,
    GaussianFourierProjection,
    GroupNorm,
    ResnetBlockBigGAN,
    ResnetBlockDDPM,
    Upsample,
    conv3x3,
    default_init,
    get_act,
    get_timestep_embedding,
)

from .ddpm_unet import squeeze2x
from .registry import register_model


@register_model(name="ncsnpp")
class NCSNpp(nn.Module):
    """(ncsnpp.py:39-388)"""

    config: object

    @nn.compact
    def __call__(self, x, time_cond, *, train: bool = False):
        config = self.config
        act = get_act(config)
        m = config.model
        nf = m.nf
        ch_mult = tuple(m.ch_mult)
        num_res_blocks = m.num_res_blocks
        attn_resolutions = tuple(m.attn_resolutions)
        dropout = m.get("dropout", 0.0)
        resamp_with_conv = m.get("resamp_with_conv", True)
        num_resolutions = len(ch_mult)
        base_res = config.data.get(
            "effective_image_size", config.data.image_size
        )
        all_resolutions = [base_res // (2**i) for i in range(num_resolutions)]
        conditional = m.get("conditional", True)
        fir = m.get("fir", True)
        fir_kernel = tuple(m.get("fir_kernel", (1, 3, 3, 1)))
        skip_rescale = m.get("skip_rescale", True)
        resblock_type = m.get("resblock_type", "biggan").lower()
        progressive = m.get("progressive", "none").lower()
        progressive_input = m.get("progressive_input", "none").lower()
        embedding_type = m.get("embedding_type", "fourier").lower()
        init_scale = m.get("init_scale", 0.0)
        combine_method = m.get("progressive_combine", "sum").lower()
        out_channels = m.get("output_channels", config.data.num_channels)

        # --- time embedding (ncsnpp.py:242-262) ---
        if embedding_type == "fourier":
            temb = GaussianFourierProjection(
                embedding_size=nf, scale=m.get("fourier_scale", 16.0)
            )(time_cond)
        elif embedding_type == "positional":
            temb = get_timestep_embedding(time_cond, nf)
        else:
            raise ValueError(f"embedding type '{embedding_type}' unknown")
        if conditional:
            temb = nn.Dense(nf * 4, kernel_init=default_init())(temb)
            temb = nn.Dense(nf * 4, kernel_init=default_init())(act(temb))
        else:
            temb = None

        if not config.data.get("centered", False):
            x = 2 * x - 1.0

        ddpm_cls, biggan_cls = ResnetBlockDDPM, ResnetBlockBigGAN
        if m.get("remat", False):
            # rematerialize resblocks in the backward pass (trade FLOPs for
            # activation memory on big configs); train (argnum 3) is static
            ddpm_cls = nn.remat(ResnetBlockDDPM, static_argnums=(3,))
            biggan_cls = nn.remat(ResnetBlockBigGAN, static_argnums=(3,))
        if resblock_type == "ddpm":
            def res_block(out_ch=None, up=False, down=False):
                assert not (up or down)
                return ddpm_cls(
                    act=act, out_ch=out_ch, dropout=dropout,
                    skip_rescale=skip_rescale, init_scale=init_scale,
                )
        elif resblock_type == "biggan":
            def res_block(out_ch=None, up=False, down=False):
                return biggan_cls(
                    act=act, out_ch=out_ch, up=up, down=down,
                    dropout=dropout, fir=fir, fir_kernel=fir_kernel,
                    skip_rescale=skip_rescale, init_scale=init_scale,
                )
        else:
            raise ValueError(f"resblock type '{resblock_type}' unknown")

        attn = lambda: AttnBlock(skip_rescale=skip_rescale,
                                 init_scale=init_scale)
        sqrt2 = math.sqrt(2.0)

        # --- down path (ncsnpp.py:268-309) ---
        input_pyramid = x if progressive_input != "none" else None
        hs = [conv3x3(nf)(x)]
        for i_level in range(num_resolutions):
            for _ in range(num_res_blocks):
                h = res_block(nf * ch_mult[i_level])(hs[-1], temb, train)
                if all_resolutions[i_level] in attn_resolutions:
                    h = attn()(h)
                hs.append(h)
            if i_level != num_resolutions - 1:
                if resblock_type == "ddpm":
                    h = Downsample(with_conv=resamp_with_conv, fir=fir,
                                   fir_kernel=fir_kernel)(hs[-1])
                else:
                    h = res_block(down=True)(hs[-1], temb, train)
                if progressive_input == "input_skip":
                    input_pyramid = Downsample(with_conv=False, fir=fir,
                                               fir_kernel=fir_kernel)(
                        input_pyramid
                    )
                    h = Combine(out_ch=h.shape[-1], method=combine_method)(
                        input_pyramid, h
                    )
                elif progressive_input == "residual":
                    input_pyramid = Downsample(
                        with_conv=True, fir=fir, fir_kernel=fir_kernel,
                        out_ch=h.shape[-1],
                    )(input_pyramid)
                    input_pyramid = (
                        (input_pyramid + h) / sqrt2 if skip_rescale
                        else input_pyramid + h
                    )
                    h = input_pyramid
                hs.append(h)

        # --- middle (ncsnpp.py:311-317) ---
        h = hs[-1]
        h = res_block()(h, temb, train)
        h = attn()(h)
        h = res_block()(h, temb, train)

        # --- up path with progressive output (ncsnpp.py:321-372) ---
        pyramid = None
        for i_level in reversed(range(num_resolutions)):
            for _ in range(num_res_blocks + 1):
                h = res_block(nf * ch_mult[i_level])(
                    jnp.concatenate([h, hs.pop()], axis=-1), temb, train
                )
            if all_resolutions[i_level] in attn_resolutions:
                h = attn()(h)
            if progressive != "none":
                C = h.shape[-1]
                if i_level == num_resolutions - 1:
                    ph = GroupNorm(num_groups=min(C // 4, 32),
                                   epsilon=1e-6, act=act)(h)
                    if progressive == "output_skip":
                        pyramid = conv3x3(out_channels,
                                          init_scale=init_scale)(ph)
                    elif progressive == "residual":
                        pyramid = conv3x3(C)(ph)
                    else:
                        raise ValueError(progressive)
                else:
                    if progressive == "output_skip":
                        pyramid = Upsample(with_conv=False, fir=fir,
                                           fir_kernel=fir_kernel)(pyramid)
                        ph = GroupNorm(num_groups=min(C // 4, 32),
                                       epsilon=1e-6, act=act)(h)
                        pyramid = pyramid + conv3x3(
                            out_channels, init_scale=init_scale
                        )(ph)
                    elif progressive == "residual":
                        pyramid = Upsample(with_conv=True, fir=fir,
                                           fir_kernel=fir_kernel,
                                           out_ch=C)(pyramid)
                        pyramid = (
                            (pyramid + h) / sqrt2 if skip_rescale
                            else pyramid + h
                        )
                        h = pyramid
            if i_level != 0:
                if resblock_type == "ddpm":
                    h = Upsample(with_conv=resamp_with_conv, fir=fir,
                                 fir_kernel=fir_kernel)(h)
                else:
                    h = res_block(up=True)(h, temb, train)
        assert not hs

        if progressive == "output_skip":
            return pyramid
        C = h.shape[-1]
        h = GroupNorm(num_groups=min(C // 4, 32), epsilon=1e-6, act=act)(h)
        return conv3x3(out_channels, init_scale=init_scale)(h)


@register_model(name="ncsnpp_paired")
class NCSNppPaired(NCSNpp):
    """Joint (x, y) channel concat, dict output (ncsnpp.py:390-416)."""

    def __call__(self, batch, labels, *, train: bool = False):
        x, y = batch["x"], batch["y"]
        xc = x.shape[-1]
        out = super().__call__(
            jnp.concatenate([x, y], axis=-1), labels, train=train
        )
        return {"x": out[..., :xc], "y": out[..., xc:]}


@register_model(name="ncsnpp_2xSR")
class NCSNpp2xSR(NCSNpp):
    """2×SR via space-to-depth (ncsnpp.py:418-433)."""

    def __call__(self, batch, labels, *, train: bool = False):
        x, y = batch["x"], batch["y"]
        x = squeeze2x(x)
        xc = x.shape[-1]
        out = super().__call__(
            jnp.concatenate([x, y], axis=-1), labels, train=train
        )
        return {"x": squeeze2x(out[..., :xc], reverse=True),
                "y": out[..., xc:]}


@register_model(name="ncsnpp_KxSR")
class NCSNppKxSR(NCSNpp):
    """K×SR via bilinear resize of the condition (ncsnpp.py:435-449)."""

    def __call__(self, batch, labels, *, train: bool = False):
        x, y = batch["x"], batch["y"]
        target = self.config.data.target_resolution
        scale = self.config.data.scale
        B, _, _, yc = y.shape
        y_up = jax.image.resize(y, (B, target, target, yc), method="bilinear")
        xc = x.shape[-1]
        out = super().__call__(
            jnp.concatenate([x, y_up], axis=-1), labels, train=train
        )
        y_score = jax.image.resize(
            out[..., xc:],
            (B, target // scale, target // scale, out.shape[-1] - xc),
            method="bilinear",
        )
        return {"x": out[..., :xc], "y": y_score}
