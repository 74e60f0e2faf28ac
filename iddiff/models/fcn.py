"""Fully-connected score networks for Euclidean data.

TPU-native rebuild of /root/reference/models/fcn.py:6-107 — the paper's
k-sphere / mammoth / line score net (5×2048 MLP, ELU, dropout).  The MXU
wants big batched matmuls, so the forward is a plain stack of Dense layers
over (B, d+1); the reference's rank-3 "training process" branch
(fcn.py:42-58) is unnecessary in JAX — vmap/batching handles any leading
shape.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .registry import register_model


class _MLP(nn.Module):
    hidden_layers: int
    hidden_nodes: int
    output_size: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, h, *, train: bool = False):
        for _ in range(self.hidden_layers + 1):
            h = nn.Dense(self.hidden_nodes)(h)
            if self.dropout > 0:
                h = nn.Dropout(self.dropout, deterministic=not train)(h)
            h = nn.elu(h)
        return nn.Dense(self.output_size)(h)


@register_model(name="fcn")
class FCN(nn.Module):
    """Score MLP: input concat(x, t) → state_size output (fcn.py:32-40)."""

    config: object

    def setup(self):
        m = self.config.model
        self.net = _MLP(
            hidden_layers=m.hidden_layers,
            hidden_nodes=m.hidden_nodes,
            output_size=m.state_size,
            dropout=m.get("dropout", 0.0),
        )

    def __call__(self, x, t, *, train: bool = False):
        t = jnp.asarray(t, dtype=x.dtype)
        if t.ndim == x.ndim - 1:
            t = t[..., None]
        h = jnp.concatenate([x, jnp.broadcast_to(t, x.shape[:-1] + (1,))], axis=-1)
        return self.net(h, train=train)


@register_model(name="fcn_conditional")
class FCNConditional(nn.Module):
    """Conditional score MLP: concat(x, y, t) → score_x (fcn.py:78-107)."""

    config: object

    def setup(self):
        m = self.config.model
        self.net = _MLP(
            hidden_layers=m.hidden_layers,
            hidden_nodes=m.hidden_nodes,
            output_size=m.state_size,
            dropout=m.get("dropout", 0.0),
        )

    def __call__(self, batch, t, *, train: bool = False):
        x, y = batch["x"], batch["y"]
        if y.ndim == x.ndim - 1:
            y = y[..., None]
        t = jnp.asarray(t, dtype=x.dtype)
        if t.ndim == x.ndim - 1:
            t = t[..., None]
        h = jnp.concatenate(
            [x, y, jnp.broadcast_to(t, x.shape[:-1] + (1,))], axis=-1
        )
        return self.net(h, train=train)


@register_model(name="fcn_joint")
class FCNJoint(nn.Module):
    """Joint score MLP over (x, y): returns dict of per-domain scores
    (fcn.py:65-76; condition assumed scalar)."""

    config: object

    def setup(self):
        m = self.config.model
        self.state_size = m.state_size
        self.net = _MLP(
            hidden_layers=m.hidden_layers,
            hidden_nodes=m.hidden_nodes,
            output_size=m.state_size + 1,
            dropout=m.get("dropout", 0.0),
        )

    def __call__(self, batch, t, *, train: bool = False):
        x, y = batch["x"], batch["y"]
        if y.ndim == x.ndim - 1:
            y = y[..., None]
        t = jnp.asarray(t, dtype=x.dtype)
        if t.ndim == x.ndim - 1:
            t = t[..., None]
        h = jnp.concatenate(
            [x, y, jnp.broadcast_to(t, x.shape[:-1] + (1,))], axis=-1
        )
        score = self.net(h, train=train)
        return {"x": score[..., : self.state_size], "y": score[..., self.state_size:]}
