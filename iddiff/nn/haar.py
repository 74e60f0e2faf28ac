"""Orthonormal 2×2 Haar DWT as pure reshape + one 4×4 orthogonal matmul.

TPU-native equivalent of the reference's iunets InvertibleDownsampling2D
(init='haar', learnable=False) + permute_channels
(/root/reference/models/ddpm.py:54-78, haar_helper.py:16-41,
lightning_modules/HaarMultiScaleSdeGenerativeModel.py:41-69):
space-to-depth followed by the fixed orthogonal mixing

    M = ½ [[ 1,  1,  1,  1],   (LL)
           [ 1,  1, -1, -1],   (LH)
           [ 1, -1,  1, -1],   (HL)
           [ 1, -1, -1,  1]]   (HH)

M Mᵀ = I so the inverse is the transpose — exactly invertible, no conv
needed, and XLA fuses the whole transform into one pass.

Layouts (NHWC): `haar_forward` returns subband-major channels
[LL(C) | LH(C) | HL(C) | HH(C)] — i.e. the reference's *permuted* layout
with the DC band first.  `permute_channels` converts between this and the
color-major (c·4+s) layout for parity with iunets' raw output.
"""
from __future__ import annotations

import jax.numpy as jnp

_M = 0.5 * jnp.asarray(
    [
        [1.0, 1.0, 1.0, 1.0],
        [1.0, 1.0, -1.0, -1.0],
        [1.0, -1.0, 1.0, -1.0],
        [1.0, -1.0, -1.0, 1.0],
    ]
)


def haar_forward(x):
    """(B, H, W, C) → (B, H/2, W/2, 4C), subband-major (DC first)."""
    B, H, W, C = x.shape
    z = x.reshape(B, H // 2, 2, W // 2, 2, C)
    z = z.transpose(0, 1, 3, 5, 2, 4).reshape(B, H // 2, W // 2, C, 4)
    z = jnp.einsum("bhwcp,sp->bhwsc", z, _M.astype(x.dtype))
    return z.reshape(B, H // 2, W // 2, 4 * C)


def haar_backward(y):
    """(B, h, w, 4C) subband-major → (B, 2h, 2w, C); exact inverse."""
    B, h, w, C4 = y.shape
    C = C4 // 4
    z = y.reshape(B, h, w, 4, C)
    z = jnp.einsum("bhwsc,sp->bhwcp", z, _M.astype(y.dtype))  # Mᵀ
    z = z.reshape(B, h, w, C, 2, 2).transpose(0, 1, 4, 2, 5, 3)
    return z.reshape(B, h * 2, w * 2, C)


def permute_channels(x, forward: bool = True):
    """subband-major ↔ color-major channel layout (ddpm.py:54-78), NHWC."""
    B, H, W, C4 = x.shape
    C = C4 // 4
    if forward:
        # color-major (c·4+s) → subband-major (s·C+c)
        return x.reshape(B, H, W, C, 4).transpose(0, 1, 2, 4, 3).reshape(
            B, H, W, C4
        )
    return x.reshape(B, H, W, 4, C).transpose(0, 1, 2, 4, 3).reshape(
        B, H, W, C4
    )


def dc_coefficients(x):
    """LL band of a single-level transform (ddpm.py:232-233)."""
    C = x.shape[-1]
    return haar_forward(x)[..., : C]


def hf_coefficients(x):
    """LH/HL/HH bands (ddpm.py:235-236)."""
    C = x.shape[-1]
    return haar_forward(x)[..., C:]
