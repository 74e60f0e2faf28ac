"""Jitted train/eval steps with mesh sharding.

One compiled XLA program per step replaces the reference's
Lightning training_step + manual backward + clip + Adam + LambdaLR + EMA
side-stream pipeline (/root/reference/lightning_modules/
BaseSdeGenerativeModel.py:60-107, lightning_callbacks/ema.py:213-257).

Sharding: state (params/opt/ema) replicated, batch sharded over the mesh
'data' axis — XLA inserts the gradient psum over ICI (the NCCL-allreduce
equivalent, SURVEY.md §2.13).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from .state import TrainState


def make_train_step(loss_fn, optimizer, ema_rate: float, mesh=None,
                    state_sharding=None, with_scalars: bool = False,
                    weighted: bool = False, jit_compile: bool = True):
    """Build `train_step(state, batch[, scalars]) -> (state, loss)`.

    loss_fn: (params, batch, rng[, scalars]) -> scalar.  `scalars` is an
    optional traced float vector for epoch-dependent loss weights (FP weight
    schedule, adaptive curl λ, annealed σ_y) — traced, so schedules never
    trigger recompilation.
    state_sharding: optional TrainState-shaped pytree of NamedShardings for
    tensor-parallel params (see parallel.infer_param_sharding); default is
    fully replicated state (pure DP).
    weighted: when True the step signature becomes
    `train_step(state, batch, weights[, scalars])` and the loss is the
    weight-normalized mean of per-sample losses (weights sharded with the
    batch).  This lets the Trainer wrap-pad every batch to ONE compiled,
    mesh-divisible shape and give the pad duplicates weight 0 — exact
    gradients for any batch_size/mesh combination (the reference's
    Lightning loader trains ragged final batches equally,
    /root/reference/run_lib.py:57-71 + DataLoader semantics).
    """

    def weighted_loss(params, batch, sub, weights, scalars=None):
        arrs = batch if isinstance(batch, tuple) else (batch,)
        n = arrs[0].shape[0]
        rngs = jax.random.split(sub, n)
        one = jax.tree_util.tree_map(lambda x: x[:, None], batch)
        if with_scalars:
            per = jax.vmap(lambda b, r: loss_fn(params, b, r, scalars))(
                one, rngs)
        else:
            per = jax.vmap(lambda b, r: loss_fn(params, b, r))(one, rngs)
        return jnp.sum(per * weights) / jnp.sum(weights)

    def train_step(state: TrainState, batch, *args):
        # args: (weights?,) + (scalars?) depending on weighted/with_scalars
        rng, sub = jax.random.split(state.rng)
        if weighted:
            loss, grads = jax.value_and_grad(weighted_loss)(
                state.params, batch, sub, *args
            )
        elif with_scalars:
            loss, grads = jax.value_and_grad(loss_fn)(
                state.params, batch, sub, *args
            )
        else:
            loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, sub)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = jax.tree_util.tree_map(
            lambda e, p: ema_rate * e + (1.0 - ema_rate) * p,
            state.ema_params,
            params,
        )
        new_state = state.replace(
            step=state.step + 1,
            params=params,
            ema_params=ema,
            opt_state=opt_state,
            rng=rng,
        )
        return new_state, loss

    if not jit_compile:  # raw step fn, for tracing inside lax.scan
        return train_step
    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,))

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    state_in = state_sharding if state_sharding is not None else repl
    in_shardings = (state_in, data) \
        + ((data,) if weighted else ()) \
        + ((repl,) if with_scalars else ())
    return jax.jit(
        train_step,
        in_shardings=in_shardings,
        out_shardings=(state_in, repl),
        donate_argnums=(0,),
    )


def make_train_block(loss_fn, optimizer, ema_rate: float, gen_fn,
                     mesh=None, state_sharding=None):
    """Scan-fused training: `train_block(state, idx_blk, w_blk) ->
    (state, losses)` runs `block_size` weighted train steps in ONE XLA
    dispatch, synthesizing each batch ON DEVICE with `gen_fn(indices)`.

    This is the TPU-native hot loop for procedural datasets
    (data.on_device_generation): the host ships only an int32 index block
    (block_size, B) and a float32 weight block — a few KB — instead of a
    per-step image batch, so neither host↔device latency nor link bandwidth
    touches the step time.  Rows whose weights are all zero (epoch/budget
    tail padding) are SKIPPED via lax.cond: state (incl. step counter, RNG,
    Adam moments, EMA) passes through untouched, keeping step semantics
    identical to the per-step path — verified bit-for-bit in
    tests/test_device_gen.py.

    Gradient math per row is identical to make_train_step(weighted=True).
    """
    inner = make_train_step(loss_fn, optimizer, ema_rate, weighted=True,
                            jit_compile=False)

    def train_block(state: TrainState, idx_blk, w_blk):
        def body(st, xs):
            idx, w = xs

            def do(st):
                return inner(st, gen_fn(idx), w)

            def skip(st):
                return st, jnp.float32(0)

            return jax.lax.cond(jnp.sum(w) > 0, do, skip, st)

        return jax.lax.scan(body, state, (idx_blk, w_blk))

    if mesh is None:
        return jax.jit(train_block, donate_argnums=(0,))
    repl = NamedSharding(mesh, P())
    blk = NamedSharding(mesh, P(None, "data"))
    state_in = state_sharding if state_sharding is not None else repl
    return jax.jit(
        train_block,
        in_shardings=(state_in, blk, blk),
        out_shardings=(state_in, repl),
        donate_argnums=(0,),
    )


def make_eval_step(loss_fn, mesh=None, use_ema: bool = True):
    """`eval_step(state, batch, rng) -> loss` with EMA weights (the
    reference swaps EMA in for validation, ema.py:65-90)."""

    def eval_step(state: TrainState, batch, rng):
        params = state.ema_params if use_ema else state.params
        return loss_fn(params, batch, rng)

    if mesh is None:
        return jax.jit(eval_step)

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(
        eval_step, in_shardings=(repl, data, repl), out_shardings=repl
    )


def make_weighted_eval_step(loss_fn, mesh=None, use_ema: bool = True,
                            gen_fn=None):
    """`eval_step(state, batch, rng, weights) -> sum_i w_i * loss_i` with
    per-sample losses.

    Exact full-split evaluation over wrap-padded batches: pad duplicates get
    weight 0 so they contribute NOTHING to the split mean (an advisor
    finding on the earlier count-weighted batch mean, which still let the
    duplicated samples bias the last partial batch).  Per-sample losses are
    obtained by vmapping the scalar loss over single-sample slices — the
    same batched XLA program, but with the batch mean deferred to the
    caller's weighting.
    """

    def eval_step(state: TrainState, batch, rng, weights):
        params = state.ema_params if use_ema else state.params
        if gen_fn is not None:  # batch is an int32 index vector
            batch = gen_fn(batch)
        arrs = batch if isinstance(batch, tuple) else (batch,)
        n = arrs[0].shape[0]
        rngs = jax.random.split(rng, n)
        one = jax.tree_util.tree_map(lambda x: x[:, None], batch)
        per = jax.vmap(lambda b, r: loss_fn(params, b, r))(one, rngs)
        return jnp.sum(per * weights)

    if mesh is None:
        return jax.jit(eval_step)

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(
        eval_step,
        in_shardings=(repl, data, repl, data),
        out_shardings=repl,
    )
