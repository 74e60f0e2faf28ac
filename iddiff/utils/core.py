"""Small shared utilities.

The reference broadcasts per-batch scalars with the idiom
``std[(...,) + (None,) * len(x.shape[1:])]`` everywhere (e.g.
/root/reference/sde_lib.py:37); here that is a single `batch_mul`.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def batch_mul(scale: jax.Array, x: jax.Array) -> jax.Array:
    """Multiply a batch of tensors `x` (B, ...) by per-batch scalars (B,).

    `scale` may also be a plain scalar or already-broadcastable array.
    """
    scale = jnp.asarray(scale)
    if scale.ndim == 0:
        return scale * x
    return scale.reshape(scale.shape + (1,) * (x.ndim - scale.ndim)) * x


def flatten_batch(x: jax.Array) -> jax.Array:
    """Flatten all non-batch dimensions: (B, ...) -> (B, D)."""
    return x.reshape(x.shape[0], -1)


def tree_size(tree) -> int:
    """Total number of scalar parameters in a pytree."""
    return sum(int(jnp.size(x)) for x in jax.tree_util.tree_leaves(tree))


class Registry:
    """A tiny name->object registry with a decorator interface.

    Mirrors the reference's register_model/get_model pattern
    (/root/reference/models/utils.py:24-47) for models, predictors,
    correctors, datasets and trainers.
    """

    def __init__(self, kind: str):
        self.kind = kind
        self._entries: dict[str, object] = {}

    def register(self, cls=None, *, name: str | None = None):
        def _register(obj):
            key = name if name is not None else obj.__name__
            if key in self._entries:
                raise ValueError(f"{self.kind} '{key}' already registered")
            self._entries[key] = obj
            return obj

        if cls is None:
            return _register
        return _register(cls)

    def get(self, name: str):
        if name not in self._entries:
            raise KeyError(
                f"Unknown {self.kind} '{name}'. Available: {sorted(self._entries)}"
            )
        return self._entries[name]

    def names(self):
        return sorted(self._entries)

    def __contains__(self, name: str) -> bool:
        return name in self._entries
