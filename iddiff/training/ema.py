"""EMA utilities: functional update + a stateful wrapper for API parity.

The production EMA lives inside the jitted train step
(training/train_step.py) as a tree-map — replacing the reference's
EMAOptimizer side-stream machinery (/root/reference/lightning_callbacks/
ema.py:157-329).  This module additionally mirrors the importable
`ExponentialMovingAverage` class surface (/root/reference/models/ema.py:14)
— store / copy_to / restore / update — for users porting code that drives
EMA manually.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_update(ema_params, params, decay: float):
    """ema ← decay·ema + (1−decay)·params (pure, jit-safe)."""
    return jax.tree_util.tree_map(
        lambda e, p: decay * e + (1.0 - decay) * p, ema_params, params
    )


class ExponentialMovingAverage:
    """Stateful shadow-parameter tracker (models/ema.py:14-187 surface)."""

    def __init__(self, params, decay: float = 0.999, use_num_updates: bool = True):
        if not 0.0 <= decay <= 1.0:
            raise ValueError("decay must be in [0, 1]")
        self.decay = decay
        self.num_updates = 0 if use_num_updates else None
        self.shadow_params = jax.tree_util.tree_map(
            lambda p: jnp.array(p, copy=True), params
        )
        self._stored = None

    def update(self, params):
        decay = self.decay
        if self.num_updates is not None:
            self.num_updates += 1
            decay = min(
                decay, (1 + self.num_updates) / (10 + self.num_updates)
            )
        self.shadow_params = ema_update(self.shadow_params, params, decay)

    def copy_to(self):
        """Return the EMA params (functional 'copy into the model')."""
        return self.shadow_params

    def store(self, params):
        self._stored = params

    def restore(self):
        if self._stored is None:
            raise RuntimeError("No stored params to restore")
        out, self._stored = self._stored, None
        return out

    def state_dict(self):
        return {
            "decay": self.decay,
            "num_updates": self.num_updates,
            "shadow_params": self.shadow_params,
        }

    def load_state_dict(self, state):
        self.decay = state["decay"]
        self.num_updates = state["num_updates"]
        self.shadow_params = state["shadow_params"]
