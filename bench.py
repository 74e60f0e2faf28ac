"""Benchmark: ID-estimation score-eval throughput on one chip.

Workload = the paper's headline path (BASELINE.md "cost models"): for the
10-sphere-in-R^100 config (fcn 5x2048 score net, VESDE), collect K=1600
score evaluations per datapoint at t=eps and extract the singular-value
spectrum, for P datapoints.

Two implementations are timed on the SAME chip:
  - reference-style: a faithful transplant of dim_reduction.py:154-202's
    structure — python loop over micro-batches, per-batch host RNG + host
    round-trip of every score batch, host SVD of the (K, d) matrix.
  - iddiff: the TPU-native estimator (one jitted scan, on-device Gram+eigh).

The reference publishes NO absolute performance numbers (BASELINE.md), so
`vs_baseline` is the measured speedup of the tpu-native estimator over the
reference algorithm structure on identical hardware.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from iddiff.configs.dimension_estimation.ksphere import ksphere_config
    from iddiff.data.ksphere import generate_ksphere
    from iddiff.id import collect_spectra, num_score_batches
    from iddiff.models import create_model, get_score_fn
    from iddiff.sde import get_sde
    from iddiff.utils import batch_mul

    config = ksphere_config(manifold_dim=10, ambient_dim=100)
    d = config.data.ambient_dim
    B = config.training.batch_size  # 500
    P = 8  # datapoints per timing run

    model = create_model(config)
    sde, eps = get_sde(config)
    rng = jax.random.PRNGKey(0)
    x_init = jnp.ones((B, d), jnp.float32)
    params = model.init(rng, x_init, jnp.zeros((B,)))["params"]
    score_fn = get_score_fn(sde, model, params, train=False)

    data = generate_ksphere(
        n_samples=P, n_spheres=1, ambient_dim=d, manifold_dim=10,
        noise_std=0.0, embedding_type="random_isometry", seed=1,
    )
    num_batches, extra, K = num_score_batches(d, B)

    # ---- reference-style (dim_reduction.py:154-202 structure) -------------
    score_jit = jax.jit(score_fn)
    vec_t = jnp.full((B,), eps, jnp.float32)

    def reference_style_run(points):
        host_rng = np.random.default_rng(0)
        spectra = []
        for x in points:
            x_tiled = np.repeat(x[None], B, axis=0)
            scores = []
            for i in range(1, num_batches + 1):
                z = host_rng.normal(size=x_tiled.shape).astype(np.float32)
                batch = jnp.asarray(x_tiled)
                mean, std = sde.marginal_prob(batch, vec_t)
                batch = mean + batch_mul(std, jnp.asarray(z))
                s = np.asarray(score_jit(batch, vec_t))  # device->host each batch
                scores.append(s if i < num_batches else s[:extra])
            scores = np.concatenate(scores, axis=0)
            scores = scores - scores.mean(axis=0, keepdims=True)
            spectra.append(np.linalg.svd(scores, compute_uv=False))  # host SVD
        return np.stack(spectra)

    # warmup + time
    reference_style_run(data[:1])
    t0 = time.perf_counter()
    reference_style_run(data)
    t_ref = time.perf_counter() - t0

    # ---- iddiff TPU-native -------------------------------------------------
    from iddiff.id import make_spectra_fn

    datapoints = jnp.asarray(data)
    spectra_fn, _K = make_spectra_fn(
        sde, model, data_shape=(d,), batch_size=B, t=eps
    )
    spectra_fn(jax.random.PRNGKey(1), params, datapoints).block_until_ready()
    t0 = time.perf_counter()
    out = spectra_fn(jax.random.PRNGKey(2), params, datapoints)
    out.block_until_ready()
    t_opt = time.perf_counter() - t0

    total_evals = P * K
    evals_per_sec = total_evals / t_opt
    ref_evals_per_sec = total_evals / t_ref
    print(
        json.dumps(
            {
                "metric": "id_estimation_score_evals_per_sec_per_chip",
                "value": round(evals_per_sec, 1),
                "unit": "score-evals/s (incl. spectrum extraction)",
                "vs_baseline": round(evals_per_sec / ref_evals_per_sec, 2),
            }
        )
    )
    print(
        f"# reference-style: {ref_evals_per_sec:.1f} evals/s ({t_ref:.3f}s), "
        f"iddiff: {evals_per_sec:.1f} evals/s ({t_opt:.3f}s), "
        f"P={P}, K={K}, d={d}, device={jax.devices()[0].platform}",
        file=sys.stderr,
    )

    if os.environ.get("IDDIFF_BENCH_FULL") == "1":
        _bench_mnist_id()
        _bench_train_step()


def _bench_mnist_id():
    """Secondary: MNIST-scale (d=1024) DDPM U-Net ID estimation, fp32 vs bf16."""
    import jax
    import jax.numpy as jnp

    from iddiff.configs.dimension_estimation.mnist import get_config
    from iddiff.id import make_spectra_fn
    from iddiff.models import create_model
    from iddiff.sde import get_sde

    for dtype in [None, "bfloat16"]:
        config = get_config()
        config.training.batch_size = 128
        if dtype:
            config.model.compute_dtype = dtype
        model = create_model(config)
        sde, eps = get_sde(config)
        x = jnp.ones((2, 32, 32, 1), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((2,)))["params"]
        P = 2
        data = jax.random.uniform(jax.random.PRNGKey(1), (P, 32, 32, 1))
        fn, K = make_spectra_fn(
            sde, model, data_shape=(32, 32, 1), batch_size=128, t=eps
        )
        fn(jax.random.PRNGKey(2), params, data).block_until_ready()
        t0 = time.perf_counter()
        fn(jax.random.PRNGKey(3), params, data).block_until_ready()
        dt = time.perf_counter() - t0
        print(
            f"# mnist-id ({dtype or 'float32'}): {P * K / dt:.1f} evals/s "
            f"({dt:.3f}s for P={P}, K={K}, d=1024)",
            file=sys.stderr,
        )


def _bench_train_step():
    """Secondary: MNIST DDPM training step throughput, fp32 vs bf16."""
    import jax
    import jax.numpy as jnp

    from iddiff.configs.dimension_estimation.mnist import get_config
    from iddiff.losses import get_sde_loss_fn
    from iddiff.models import create_model
    from iddiff.sde import get_sde
    from iddiff.training import TrainState, make_optimizer, make_train_step

    for dtype in [None, "bfloat16"]:
        config = get_config()
        if dtype:
            config.model.compute_dtype = dtype
        model = create_model(config)
        sde, eps = get_sde(config)
        B = config.training.batch_size
        x = jax.random.uniform(jax.random.PRNGKey(0), (B, 32, 32, 1))
        params = model.init(jax.random.PRNGKey(1), x, jnp.zeros((B,)))["params"]
        loss_fn = get_sde_loss_fn(sde, model, train=True, eps=eps)
        optimizer = make_optimizer(config)
        state = TrainState.create(params, optimizer.init(params),
                                  jax.random.PRNGKey(2))
        step = make_train_step(loss_fn, optimizer, ema_rate=0.9999)
        state, loss = step(state, x)
        loss.block_until_ready()
        n = 10
        t0 = time.perf_counter()
        for _ in range(n):
            state, loss = step(state, x)
        loss.block_until_ready()
        dt = time.perf_counter() - t0
        print(
            f"# mnist-train ({dtype or 'float32'}): {n / dt:.2f} steps/s "
            f"(B={B}, {B * n / dt:.0f} img/s)",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
