"""Functional training state: (params, ema_params, opt_state, step, rng).

Defined exactly as SURVEY.md §7 prescribes ("define the functional
train-state ... from day one").  This replaces three reference subsystems at
once: Lightning module state, the EMAOptimizer wrapper
(/root/reference/lightning_callbacks/ema.py:157-329 — side CUDA streams,
weight swapping), and optimizer state_dict surgery (:300-325).  EMA is a
pure tree-map inside the jitted step; "validate with EMA weights" is just
reading `state.ema_params`.
"""
from __future__ import annotations

from typing import Any

import flax.struct
import jax


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    ema_params: Any
    opt_state: Any
    rng: jax.Array

    @classmethod
    def create(cls, params, opt_state, rng):
        import jax.numpy as jnp

        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            # real copy: ema must NOT alias params (buffer donation in the
            # jitted train step would otherwise donate the same buffer twice)
            ema_params=jax.tree_util.tree_map(
                lambda x: jnp.array(x, copy=True), params
            ),
            opt_state=opt_state,
            rng=rng,
        )
