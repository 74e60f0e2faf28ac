"""Profiler-backed decomposition of the image-scale ID estimator
(VERDICT r2 item 2: prove where the d=1024 DDPM workload's time goes).

Runs on the real chip.  Produces:
  - artifacts/profile_image_id.md — op-level/ablation table:
      * compiled-model FLOPs per forward (XLA cost analysis)
      * score-forward-only throughput at several batch sizes, fp32 vs bf16
      * full-estimator time vs forward-only time (spectrum overhead)
      * attention-off ablation (how much the 16x16 einsum attention costs)
  - artifacts/profile_image_trace/ — a jax.profiler trace of one
    estimator call (the checked-in artifact the r2 verdict asked for).

Timing uses the host-copy fence (np.asarray): block_until_ready returns
early on the tunneled axon backend (measured in round 2).

Usage: python scripts/profile_image_id.py [P]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def fence(x):
    return np.asarray(x)


def best_of(f, n=3):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        f()
        ts.append(time.perf_counter() - t0)
    return min(ts), float(np.mean(ts)), float(np.std(ts))


def main():
    from iddiff.configs.dimension_estimation.mnist import get_config
    from iddiff.id import make_spectra_fn, num_score_batches
    from iddiff.models import create_model, get_score_fn
    from iddiff.sde import get_sde
    from iddiff.utils import enable_compile_cache

    enable_compile_cache()
    P = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    lines = []

    def log(s):
        print(s, flush=True)
        lines.append(s)

    log(f"# Image-ID estimator profile (device={jax.devices()[0]})")
    d = 1024
    _, _, K = num_score_batches(d, 128)

    # ---- forward-only sweep: batch x dtype x attention ------------------
    log("\n## Score-forward throughput (forward only, no estimator)")
    log("| variant | batch | ms/batch | evals/s | TFLOP/s |")
    log("|---|---|---|---|---|")
    results = {}
    for variant, overrides in [
        ("fp32", {}),
        ("bf16", {"model.compute_dtype": "bfloat16"}),
        ("fp32 no-attn", {"model.attn_resolutions": []}),
    ]:
        config = get_config()
        for k, v in overrides.items():
            config.update_from_flattened_dict({k: v})
        model = create_model(config)
        sde, eps = get_sde(config)
        for B in [128, 256, 512]:
            x = jnp.asarray(
                np.random.default_rng(0).uniform(size=(B, 32, 32, 1)),
                jnp.float32)
            params = model.init(
                jax.random.PRNGKey(0), x, jnp.zeros((B,)))["params"]
            score_fn = jax.jit(get_score_fn(sde, model, params, train=False))
            vec_t = jnp.full((B,), eps, jnp.float32)
            try:
                cost = score_fn.lower(x, vec_t).compile().cost_analysis()
                if isinstance(cost, list):
                    cost = cost[0]
                flops = float(cost.get("flops", 0.0))
            except Exception:
                flops = 0.0
            fence(score_fn(x, vec_t))
            best, mean, sd = best_of(lambda: fence(score_fn(x, vec_t)))
            eps_s = B / best
            tf = flops / best / 1e12
            log(f"| {variant} | {B} | {best * 1e3:.1f} "
                f"(mean {mean * 1e3:.1f}±{sd * 1e3:.1f}) | {eps_s:,.0f} | "
                f"{tf:.1f} |")
            results[(variant, B)] = (best, eps_s, flops)

    # ---- full estimator: fp32 vs bf16, compute-batch sweep --------------
    log("\n## Full estimator (spectra incl. Gram+eigh), P=%d, K=%d" % (P, K))
    log("| variant | compute batch | s/point | evals/s | fwd-only s/point |")
    log("|---|---|---|---|---|")
    data = np.random.default_rng(1).uniform(size=(P, 32, 32, 1)).astype(
        np.float32)
    spectra_ref = {}
    for variant, overrides in [
        ("fp32", {}),
        ("bf16", {"model.compute_dtype": "bfloat16"}),
    ]:
        config = get_config()
        for k, v in overrides.items():
            config.update_from_flattened_dict({k: v})
        model = create_model(config)
        sde, eps = get_sde(config)
        x0 = jnp.ones((128, 32, 32, 1), jnp.float32)
        params = model.init(
            jax.random.PRNGKey(0), x0, jnp.zeros((128,)))["params"]
        for B_c in [128, 256, 512]:
            fn, _ = make_spectra_fn(
                sde, model, data_shape=(32, 32, 1), batch_size=128, t=eps,
                compute_batch_size=B_c)
            dev = jnp.asarray(data)
            out = fence(fn(jax.random.PRNGKey(2), params, dev))
            spectra_ref[(variant, B_c)] = out
            best, mean, sd = best_of(
                lambda: fence(fn(jax.random.PRNGKey(3), params, dev)))
            fwd = results.get((variant if variant != "bf16" else "bf16",
                               min(B_c, 512)))
            fwd_s = (K / fwd[1]) if fwd else float("nan")
            log(f"| {variant} | {B_c} | {best / P:.3f} "
                f"(mean {mean / P:.3f}±{sd / P:.3f}) | {P * K / best:,.0f} "
                f"| {fwd_s:.3f} |")

    # numerics: bf16 spectra must read the same dims as fp32
    from iddiff.id.readout import dims_from_spectra
    d32 = dims_from_spectra(np.asarray(spectra_ref[("fp32", 128)]))
    d16 = dims_from_spectra(np.asarray(spectra_ref[("bf16", 128)]))
    log(f"\nread-out parity fp32 vs bf16 (same rng): {list(d32)} vs {list(d16)}")

    # ---- profiler trace (the artifact) ----------------------------------
    config = get_config()
    model = create_model(config)
    sde, eps = get_sde(config)
    x0 = jnp.ones((128, 32, 32, 1), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x0, jnp.zeros((128,)))["params"]
    fn, _ = make_spectra_fn(
        sde, model, data_shape=(32, 32, 1), batch_size=128, t=eps,
        compute_batch_size=128)
    dev = jnp.asarray(data)
    fence(fn(jax.random.PRNGKey(2), params, dev))
    trace_dir = os.path.join("artifacts", "profile_image_trace")
    os.makedirs(trace_dir, exist_ok=True)
    with jax.profiler.trace(trace_dir):
        fence(fn(jax.random.PRNGKey(3), params, dev))
    log(f"\nprofiler trace written to {trace_dir}/")

    with open(os.path.join("artifacts", "profile_image_id.md"), "w") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
