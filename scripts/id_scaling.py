"""Sharded-ID-estimator scaling curve on the fake 8-device CPU mesh
(VERDICT r2 item 10, SURVEY §7 stretch).

The reference's estimator is single-device (dim_reduction.py:154-202); the
iddiff estimator shards the datapoint axis over the mesh's 'data' axis.
This script measures wall-clock per datapoint at 1/2/4/8-way sharding on
the fake CPU mesh (XLA_FLAGS=--xla_force_host_platform_device_count=8) —
the multi-chip story a single real chip can't tell.  Fake CPU devices are
threads of one host sharing its cores, so the curve measures the sharding
MECHANICS (correct SPMD partitioning, no replicated compute) and gives a
lower bound on real-mesh scaling; on a TPU pod slice the shards own
disjoint chips.

Usage: python scripts/id_scaling.py [P] [repeats]
Prints a markdown table for RESULTS.md.
"""
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iddiff.configs.dimension_estimation.ksphere import ksphere_config
from iddiff.data.ksphere import generate_ksphere
from iddiff.id import make_spectra_fn
from iddiff.models import create_model
from iddiff.parallel import make_mesh
from iddiff.sde import get_sde


def main():
    P = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    config = ksphere_config(manifold_dim=10, ambient_dim=100)
    d = config.data.ambient_dim
    B = config.training.batch_size
    model = create_model(config)
    sde, eps = get_sde(config)
    rng = jax.random.PRNGKey(0)
    x0 = jnp.ones((B, d), jnp.float32)
    params = model.init(rng, x0, jnp.zeros((B,)))["params"]
    data = jnp.asarray(generate_ksphere(
        n_samples=P, n_spheres=1, ambient_dim=d, manifold_dim=10,
        noise_std=0.0, embedding_type="random_isometry", seed=1))

    print(f"# fcn 5x2048, d={d}, B={B}, P={P} datapoints, best-of-{repeats}")
    print("# NOTE: this host has ONE physical core; the fake devices are")
    print("# threads, so wall-clock cannot show real scaling.  The honest")
    print("# evidence is the compiled PER-DEVICE FLOPs: SPMD partitioning")
    print("# must divide the work by n (no replicated compute).")
    print("| data-axis shards | per-device GFLOP | work split | wall s/run |")
    print("|---|---|---|---|")
    f1 = None
    for n in [1, 2, 4, 8]:
        mesh = make_mesh(n_data=n, devices=jax.devices()[:n])
        fn, K = make_spectra_fn(
            sde, model, data_shape=(d,), batch_size=B, t=eps, mesh=mesh)
        np.asarray(fn(jax.random.PRNGKey(1), params, data))  # compile
        # per-device flops of the partitioned executable
        try:
            cost = (
                jax.jit(fn)
                .lower(jax.random.PRNGKey(1), params, data)
                .compile()
                .cost_analysis()
            )
            if isinstance(cost, list):
                cost = cost[0]
            gflop = float(cost.get("flops", 0.0)) / 1e9
        except Exception:
            gflop = float("nan")
        if f1 is None:
            f1 = gflop
        times = []
        for r in range(repeats):
            t0 = time.perf_counter()
            np.asarray(fn(jax.random.PRNGKey(2 + r), params, data))
            times.append(time.perf_counter() - t0)
        best = min(times)
        print(f"| {n} | {gflop:,.1f} | {f1 / gflop:.2f}x | {best:.3f} |")


if __name__ == "__main__":
    main()
