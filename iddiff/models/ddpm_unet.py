"""DDPM U-Net score network + paired/SR variants — the paper's image net.

Behavioral rebuild of /root/reference/models/ddpm.py:80-331 (itself the
torch port of Ho et al.'s unet.py) in Flax/NHWC.  Differences from the
reference's module-list walk (ddpm.py:149-213): layers are declared
structurally (setup-free @nn.compact), resolutions are tracked statically,
and channel-last keeps convs on the TPU-native layout.

Config knobs honored (configs/.../MNIST/config.py:121-141): nf, ch_mult,
num_res_blocks, attn_resolutions, resamp_with_conv, conditional, dropout,
centered, input_channels, output_channels, effective_image_size.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from iddiff.nn import (
    AttnBlock,
    Downsample,
    GroupNorm,
    ResnetBlockDDPM,
    Upsample,
    conv3x3,
    default_init,
    get_act,
    get_timestep_embedding,
)

from .registry import register_model


def squeeze2x(z, reverse: bool = False):
    """Space-to-depth H×W×C ↔ H/2×W/2×4C (ddpm.py SqueezeBlock:39-52), NHWC."""
    B, H, W, C = z.shape
    if not reverse:
        z = z.reshape(B, H // 2, 2, W // 2, 2, C)
        z = z.transpose(0, 1, 3, 5, 2, 4)
        return z.reshape(B, H // 2, W // 2, C * 4)
    z = z.reshape(B, H, W, C // 4, 2, 2)
    z = z.transpose(0, 1, 4, 2, 5, 3)
    return z.reshape(B, H * 2, W * 2, C // 4)


@register_model(name="ddpm")
class DDPM(nn.Module):
    """(ddpm.py:80-213)"""

    config: object

    @nn.compact
    def __call__(self, x, labels, *, train: bool = False):
        config = self.config
        act = get_act(config)
        nf = config.model.nf
        ch_mult = tuple(config.model.ch_mult)
        num_res_blocks = config.model.num_res_blocks
        attn_resolutions = tuple(config.model.attn_resolutions)
        dropout = config.model.get("dropout", 0.0)
        resamp_with_conv = config.model.get("resamp_with_conv", True)
        num_resolutions = len(ch_mult)
        base_res = config.data.get(
            "effective_image_size", config.data.image_size
        )
        all_resolutions = [base_res // (2**i) for i in range(num_resolutions)]
        conditional = config.model.get("conditional", True)
        output_channels = config.model.output_channels

        # time embedding (ddpm.py:152-159)
        if conditional:
            temb = get_timestep_embedding(labels, nf)
            temb = nn.Dense(nf * 4, kernel_init=default_init())(temb)
            temb = nn.Dense(nf * 4, kernel_init=default_init())(act(temb))
        else:
            temb = None

        h = x if config.data.get("centered", False) else 2 * x - 1.0

        if config.model.get("remat", False):
            # rematerialize resblocks in the backward pass: trades FLOPs for
            # HBM so deep U-Nets fit larger batches (jax.checkpoint).
            # `train` is passed positionally (static arg 3 incl. module self).
            # NOTE: remat changes flax scope names — set it before training;
            # checkpoints are not interchangeable across the flag.
            block_cls = nn.remat(ResnetBlockDDPM, static_argnums=(3,))
            block = lambda out_ch: (
                lambda h, temb, train=False: block_cls(
                    act=act, out_ch=out_ch, dropout=dropout
                )(h, temb, train)
            )
        else:
            block = lambda out_ch: ResnetBlockDDPM(
                act=act, out_ch=out_ch, dropout=dropout
            )

        # down path
        hs = [conv3x3(nf)(h)]
        for i_level in range(num_resolutions):
            for _ in range(num_res_blocks):
                h = block(nf * ch_mult[i_level])(hs[-1], temb, train=train)
                if all_resolutions[i_level] in attn_resolutions:
                    h = AttnBlock()(h)
                hs.append(h)
            if i_level != num_resolutions - 1:
                hs.append(Downsample(with_conv=resamp_with_conv)(hs[-1]))

        # middle
        h = hs[-1]
        h = block(None)(h, temb, train=train)
        h = AttnBlock()(h)
        h = block(None)(h, temb, train=train)

        # up path with lateral skips
        for i_level in reversed(range(num_resolutions)):
            for _ in range(num_res_blocks + 1):
                h = block(nf * ch_mult[i_level])(
                    jnp.concatenate([h, hs.pop()], axis=-1), temb, train=train
                )
            if all_resolutions[i_level] in attn_resolutions:
                h = AttnBlock()(h)
            if i_level != 0:
                h = Upsample(with_conv=resamp_with_conv)(h)
        assert not hs

        C = h.shape[-1]
        h = GroupNorm(num_groups=min(C // 4, 32), epsilon=1e-6, act=act)(h)
        h = conv3x3(output_channels, init_scale=0.0)(h)
        return h


@register_model(name="ddpm_multi_speed_haar")
class DDPMMultiSpeedHaar(DDPM):
    """Multi-speed Haar DDPM (ddpm.py:215-273): the score net runs in image
    space; inputs/outputs are dicts of Haar pyramid coefficients
    {'d1': HF_1, ..., 'dK': HF_K, 'aK': DC_K} (subband-major NHWC, see
    iddiff.nn.haar)."""

    def convert_to_image_space(self, haar_x: dict):
        from iddiff.nn.haar import haar_backward

        depth = max(int(k[1:]) for k in haar_x if k.startswith("a"))
        a = haar_x[f"a{depth}"]
        for i in range(depth):
            d = haar_x[f"d{depth - i}"]
            a = haar_backward(jnp.concatenate([a, d], axis=-1))
        return a

    def convert_to_haar_space(self, x, max_depth: int):
        from iddiff.nn.haar import haar_forward

        out = {}
        for i in range(max_depth):
            h = haar_forward(x)
            C = h.shape[-1] // 4
            out[f"d{i + 1}"] = h[..., C:]
            x = h[..., :C]
            if i == max_depth - 1:
                out[f"a{i + 1}"] = x
        return out

    def __call__(self, haar_x: dict, labels, *, train: bool = False):
        x = self.convert_to_image_space(haar_x)
        image_out = super().__call__(x, labels, train=train)
        depth = max(int(k[1:]) for k in haar_x if k.startswith("a"))
        return self.convert_to_haar_space(image_out, depth)


@register_model(name="ddpm_paired_SR3")
class DDPMPairedSR3(DDPM):
    """SR3 conditioning: concat (x, y) channels, predict score of x only
    (ddpm.py:275-285)."""

    def __call__(self, batch, labels, *, train: bool = False):
        x, y = batch["x"], batch["y"]
        concat = jnp.concatenate([x, y], axis=-1)
        return super().__call__(concat, labels, train=train)


@register_model(name="ddpm_paired")
class DDPMPaired(DDPM):
    """Joint score over (x, y) channel split (ddpm.py:287-298)."""

    def __call__(self, batch, labels, *, train: bool = False):
        x, y = batch["x"], batch["y"]
        xc = x.shape[-1]
        out = super().__call__(
            jnp.concatenate([x, y], axis=-1), labels, train=train
        )
        return {"x": out[..., :xc], "y": out[..., xc:]}


@register_model(name="ddpm_2xSR")
class DDPM2xSR(DDPM):
    """2× super-resolution via space-to-depth of the HR image
    (ddpm.py:300-314)."""

    def __call__(self, batch, labels, *, train: bool = False):
        x, y = batch["x"], batch["y"]
        x = squeeze2x(x)
        xc = x.shape[-1]
        out = super().__call__(
            jnp.concatenate([x, y], axis=-1), labels, train=train
        )
        return {
            "x": squeeze2x(out[..., :xc], reverse=True),
            "y": out[..., xc:],
        }


@register_model(name="ddpm_KxSR")
class DDPMKxSR(DDPM):
    """K× SR: bilinear-resize y to GT resolution, concat, resize the y-score
    back down (ddpm.py:316-331)."""

    def __call__(self, batch, labels, *, train: bool = False):
        x, y = batch["x"], batch["y"]
        target = self.config.data.target_resolution
        scale = self.config.data.scale
        B, _, _, yc = y.shape
        y_up = jax.image.resize(
            y, (B, target, target, yc), method="bilinear"
        )
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
