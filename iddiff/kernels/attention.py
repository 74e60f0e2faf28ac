"""Fused (flash) attention path for the U-Net attention blocks.

The d=1024 image-ID profile (artifacts/profile_image_id.md) attributes
~25% of device time to add/reduce fusions, part of which is the attention
softmax: XLA materializes the (B, HW, HW) score tensor in HBM
(B=128, HW=256 -> 32 MB fp32 per block eval). The TPU Pallas flash kernel
(jax.experimental.pallas.ops.tpu.flash_attention, public JAX) keeps the
scores in VMEM tiles instead, with its own custom_vjp.

Opt-in like the fused GroupNorm (same measure-then-enable discipline):
IDDIFF_FLASH_ATTN=1 or set_flash_attention(True). Shapes are gated to the
kernel's block constraints (seq and head dim multiples of 128); attention
at 8x8 feature maps (HW=64) stays on the XLA einsum path.
"""
from __future__ import annotations

import math
import os

import jax
import jax.numpy as jnp

_FLASH = os.environ.get("IDDIFF_FLASH_ATTN", "0") == "1"


def set_flash_attention(enabled: bool) -> None:
    global _FLASH
    _FLASH = bool(enabled)


def flash_attention_enabled() -> bool:
    return _FLASH


def _viable(q, k) -> bool:
    if jax.devices()[0].platform != "tpu":
        return False
    _, Lq, C = q.shape
    Lk = k.shape[1]
    # the Pallas kernel tiles q AND kv sequences in 128 blocks
    return Lq % 128 == 0 and Lk % 128 == 0 and C % 128 == 0


def attention(q, k, v):
    """Single-head softmax attention on (B, L, C): softmax(q k^T / sqrt(C)) v.

    Math identical to the reference AttnBlock einsums
    (models/layers.py:567-590); routed through the Pallas flash kernel when
    enabled + viable, else the XLA einsum formulation.
    """
    B, L, C = q.shape
    if flash_attention_enabled() and _viable(q, k):
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            flash_attention,
        )

        out = flash_attention(
            q[:, None], k[:, None], v[:, None], sm_scale=1.0 / math.sqrt(C)
        )
        return out[:, 0]
    w = jnp.einsum("bic,bjc->bij", q, k) / math.sqrt(C)
    w = jax.nn.softmax(w, axis=-1)
    return jnp.einsum("bij,bjc->bic", w, v)
