"""Intrinsic-dimension estimation: the paper's headline algorithm, TPU-native.

Reference algorithm (/root/reference/dim_reduction.py:116-215): for each
datapoint x with ambient dim d, draw K ≈ 4·d noisy copies at t = sampling_eps,
evaluate the score network on each, stack into a (K, d) matrix, mean-center,
and read the intrinsic dimension off the singular-value spectrum.

TPU re-design (SURVEY.md §2.13, §7):
  - The reference loops micro-batches with a GPU→CPU copy per batch
    (dim_reduction.py:177-183) and runs torch.linalg.svd on the (K, d)
    matrix on the host (:197).  Here the whole estimator is ONE jitted
    program: a lax.scan accumulates the d×d Gram matrix Sᵀ S and the score
    sum on device (fp32), the centered Gram is G − K·μμᵀ, and the singular
    values are sqrt(eigh(G_centered)) — mathematically identical to the SVD
    of the centered score matrix but O(K d²) instead of O(K d²)+O(K d²)
    memory traffic, with nothing ever leaving HBM.
  - Datapoints are vmapped and can be sharded over the device mesh
    ('data' axis) — the reference is single-device here.

K mirrors the reference exactly: num_batches = (d // B + 1) · 4; every batch
contributes B rows except the last, which contributes d mod B
(dim_reduction.py:169-188).
"""
from __future__ import annotations

import math
import os
from functools import partial

import jax
import jax.numpy as jnp

from iddiff.utils import batch_mul


def num_score_batches(ambient_dim: int, batch_size: int):
    """(num_batches, rows_in_last_batch, total_K) — dim_reduction.py:169-171."""
    num_batches = (ambient_dim // batch_size + 1) * 4
    extra = ambient_dim - (ambient_dim // batch_size) * batch_size
    total = (num_batches - 1) * batch_size + extra
    return num_batches, extra, total


def score_spectrum_fn(sde, score_fn, *, data_shape, batch_size: int,
                      t: float, num_batches: int | None = None,
                      extra_in_last_batch: int | None = None):
    """Build `spectrum(rng, x) -> (singular_values, K)` for ONE datapoint.

    x has shape `data_shape` (e.g. (d,) or (H, W, C)); the returned singular
    values have length d = prod(data_shape).  Pure and jittable; vmap over a
    leading datapoint axis for many points.
    """
    d = int(math.prod(data_shape))
    if num_batches is None or extra_in_last_batch is None:
        num_batches, extra_in_last_batch, _ = num_score_batches(d, batch_size)
    B = batch_size
    # static 0/1 row-weights: all batches full except the last (extra rows)
    last_mask = (jnp.arange(B) < extra_in_last_batch).astype(jnp.float32)
    K = (num_batches - 1) * B + int(extra_in_last_batch)

    def spectrum(rng, x):
        x_tiled = jnp.broadcast_to(x[None], (B,) + tuple(data_shape))
        vec_t = jnp.full((B,), t, dtype=jnp.float32)
        mean, std = sde.marginal_prob(x_tiled, vec_t)

        def body(carry, inp):
            gram, ssum = carry
            rng_i, is_last = inp
            z = jax.random.normal(rng_i, x_tiled.shape, dtype=jnp.float32)
            perturbed = mean + batch_mul(std, z)
            s = score_fn(perturbed, vec_t).reshape(B, d).astype(jnp.float32)
            w = jnp.where(is_last, last_mask, jnp.ones((B,), jnp.float32))
            sw = s * w[:, None]
            gram = gram + sw.T @ sw
            ssum = ssum + sw.sum(axis=0)
            return (gram, ssum), None

        rngs = jax.random.split(rng, num_batches)
        is_last = jnp.arange(num_batches) == num_batches - 1
        # unroll: each scan iteration carries fixed overhead on TPU
        # (dynamic-slice of the stacked rngs + loop plumbing, ~5.5% of
        # device time in the round-4 trace); unrolling amortizes it and
        # lets XLA fuse across iterations.  Program size grows by the
        # factor, so keep it modest.
        unroll = int(os.environ.get("IDDIFF_ID_SCAN_UNROLL", "1"))
        (gram, ssum), _ = jax.lax.scan(
            body, (jnp.zeros((d, d), jnp.float32), jnp.zeros((d,), jnp.float32)),
            (rngs, is_last), unroll=max(1, unroll),
        )
        mu = ssum / K
        centered = gram - K * jnp.outer(mu, mu)
        eigs = jnp.linalg.eigvalsh(centered)  # ascending
        sing = jnp.sqrt(jnp.clip(eigs, 0.0))[::-1]  # descending, length d
        return sing

    return spectrum, K


def make_spectra_fn(sde, model, *, data_shape, batch_size: int, t: float,
                    mesh=None, continuous: bool = True,
                    compute_batch_size: int | None = None):
    """Build a REUSABLE jitted `fn(rng, params, datapoints) -> (P, d) spectra`.

    Params are a traced argument (not a baked-in constant), so EMA swaps and
    repeated calls hit the same compiled executable — this is the production
    entry point for the in-training ID hook and the benchmark.  When `mesh`
    is given, the datapoint axis is sharded over its 'data' axis.

    `compute_batch_size` decouples HOW the K score samples are batched from
    the reference's K formula: K is always num_score_batches(d, batch_size)
    — bit-parity with dim_reduction.py:169-171 — but the device collects
    them in ceil(K / compute_batch_size) forwards.  The K samples are iid
    either way (identical statistics); a larger compute batch keeps the MXU
    fuller per launch on TPU.
    """
    from iddiff.models import get_score_fn

    d = int(math.prod(data_shape))
    num_batches, extra, K = num_score_batches(d, batch_size)
    if compute_batch_size is not None and compute_batch_size != batch_size:
        B_c = int(compute_batch_size)
        num_batches = -(-K // B_c)  # ceil
        extra = K - (num_batches - 1) * B_c
        batch_size = B_c

    def spectra(rng, params, datapoints):
        score_fn = get_score_fn(sde, model, params, train=False,
                                continuous=continuous)
        spectrum, _ = score_spectrum_fn(
            sde, score_fn, data_shape=data_shape, batch_size=batch_size, t=t,
            num_batches=num_batches, extra_in_last_batch=extra,
        )
        rngs = jax.random.split(rng, datapoints.shape[0])
        return jax.vmap(spectrum)(rngs, datapoints)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P_

        repl = NamedSharding(mesh, P_())
        shard = NamedSharding(mesh, P_("data"))
        fn = jax.jit(
            spectra,
            in_shardings=(repl, repl, shard),
            out_shardings=shard,
        )
    else:
        fn = jax.jit(spectra)
    return fn, K


def collect_spectra(rng, sde, score_fn, datapoints, *, batch_size: int,
                    t: float, mesh=None):
    """One-shot convenience: spectra for a batch of datapoints (P, d).

    `score_fn` is closed over (params baked as constants) — fine for CLI
    one-offs; for repeated calls use `make_spectra_fn` to avoid retracing.
    When `mesh` is given the datapoint axis is sharded over its 'data' axis
    (the reference's single-device loop, dim_reduction.py:154-202, becomes
    embarrassingly parallel SPMD).
    """
    data_shape = datapoints.shape[1:]
    spectrum, K = score_spectrum_fn(
        sde, score_fn, data_shape=data_shape, batch_size=batch_size, t=t
    )
    P = datapoints.shape[0]
    rngs = jax.random.split(rng, P)
    fn = jax.vmap(spectrum)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P_

        sharding = NamedSharding(mesh, P_("data"))
        datapoints = jax.device_put(datapoints, sharding)
        rngs = jax.device_put(rngs, sharding)
        fn = jax.jit(
            fn,
            in_shardings=(sharding, sharding),
            out_shardings=NamedSharding(mesh, P_("data")),
        )
    else:
        fn = jax.jit(fn)
    return fn(rngs, datapoints), K
