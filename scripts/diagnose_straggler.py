"""Identify the +1 "straggler" direction and sweep the estimator knobs.

Background (RESULTS.md "Round 5: the +1 is the read-out"): on converged
image-manifold models (squares-10 / blobs-10, d=1024) the spectrum of the
centered score matrix shows the normal bulk, ONE weak-normal straggler,
and the true tangent block; the reference read-out (plot_utils.py:173-183)
counts the straggler as tangent, reading truth+1.

This script answers two follow-ups with measurements:

1. probe — WHAT is the straggler direction?  Computes the eigenVECTORS of
   the centered Gram (the estimator only needs eigenvalues) and reports,
   for each of the smallest few directions: the singular value, overlap
   with the KNOWN tangent space (blobs: jacfwd of the analytic generator
   at the sample's own stds; squares: the fixed mask basis), overlap with
   the DC (constant-image) direction, and overlap with the dataset-mean
   direction.  Hypothesis under test: GroupNorm makes the U-Net weakly
   sensitive to DC input shifts, so the DC normal direction gets a
   tangent-sized score response.

2. sweep — VERDICT r4 item 4's table: median read-out over
   t ∈ {0.5, 1, 2, 4}×sampling_eps and K ∈ {2d, 4d, 8d}, plus a
   σ-decade sweep (σ(t) ∈ {0.01, 0.03, 0.1, 0.3}) because for VESDE
   σ(t) = σ_min·(σ_max/σ_min)^t barely moves over small multiples of
   eps (≈0.03% here) — the literal eps multiples probe estimator noise,
   the σ decades probe the noise scale itself.  Each cell is read with
   the reference rule, the log_gap rule, and the reference rule with the
   tail knob (plot_utils.py:178-180).

Usage (on the TPU host, trainers paused):
  python scripts/diagnose_straggler.py --ckpt blobs --phase all
  python scripts/diagnose_straggler.py --ckpt squares --phase probe
"""
from __future__ import annotations

import argparse
import math
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def load_run(which: str):
    import importlib.util

    name = {"blobs": "blobs10_estimate", "squares": "squares10_estimate"}[which]
    spec = importlib.util.spec_from_file_location(
        name, f"/root/repo/cluster/runs/{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    config = mod.get_config()

    from iddiff.data import create_datamodule
    from iddiff.models import create_model, get_score_fn
    from iddiff.run_lib import _restore_eval_params, get_sde

    datamodule = create_datamodule(config)
    datamodule.setup()
    model = create_model(config)
    sde, sampling_eps = get_sde(config)
    wd = config.model.checkpoint_path
    params = _restore_eval_params(config, model, datamodule, wd)
    score_fn = get_score_fn(sde, model, params, train=False, continuous=True)
    return config, datamodule, sde, sampling_eps, score_fn


def gram_fn(sde, score_fn, data_shape, B, num_batches, with_vectors):
    """jitted (rng, x, t) -> (singular values desc, [eigvecs asc]) for ONE
    datapoint; t is traced so a σ-sweep reuses one executable."""
    d = int(math.prod(data_shape))

    def run(rng, x, t):
        x_tiled = jnp.broadcast_to(x[None], (B,) + tuple(data_shape))
        vec_t = jnp.full((B,), t, dtype=jnp.float32)
        mean, std = sde.marginal_prob(x_tiled, vec_t)

        def body(carry, rng_i):
            gram, ssum = carry
            z = jax.random.normal(rng_i, x_tiled.shape, dtype=jnp.float32)
            perturbed = mean + std[(...,) + (None,) * (x_tiled.ndim - 1)] * z
            s = score_fn(perturbed, vec_t).reshape(B, d).astype(jnp.float32)
            return (gram + s.T @ s, ssum + s.sum(axis=0)), None

        rngs = jax.random.split(rng, num_batches)
        (gram, ssum), _ = jax.lax.scan(
            body, (jnp.zeros((d, d), jnp.float32), jnp.zeros((d,), jnp.float32)),
            rngs)
        K = num_batches * B
        mu = ssum / K
        centered = gram - K * jnp.outer(mu, mu)
        if with_vectors:
            vals, vecs = jnp.linalg.eigh(centered)
            return jnp.sqrt(jnp.clip(vals, 0.0))[::-1], vecs
        vals = jnp.linalg.eigvalsh(centered)
        return jnp.sqrt(jnp.clip(vals, 0.0))[::-1]

    return jax.jit(run)


def blobs_point_and_tangent(config, idx: int):
    """Sample `idx` of the on-device blobs dataset + its analytic tangent
    basis: columns of ∂(normalized image)/∂std_k (iddiff/data/synthetic.py
    device_generator) evaluated at the sample's own stds."""
    from iddiff.data.synthetic import fixed_gaussians_constants

    d = config.data
    img = int(d.image_size)
    seed = int(config.seed)
    dist2 = jnp.asarray(fixed_gaussians_constants(d.num_gaussians, img, seed))
    s0, s1 = (float(v) for v in d.std_range)
    base = jax.random.fold_in(jax.random.PRNGKey(seed), 0x1DD1FF)
    key = jax.random.fold_in(base, idx)
    stds = jax.random.uniform(key, (dist2.shape[0],), minval=s0, maxval=s1)

    def image_of(stds_vec):
        st = stds_vec[:, None, None]
        amp = 1.0 / (jnp.sqrt(2 * jnp.pi) * st)
        im = (amp * jnp.exp(-dist2 / (2 * st**2))).sum(axis=0)
        mn, mx = im.min(), im.max()
        return ((im - mn) / (mx - mn)).ravel()

    x = image_of(stds).reshape(img, img, 1)
    T = jax.jacfwd(image_of)(stds)  # (d, K) tangent columns
    return np.asarray(x), np.asarray(T)


def squares_point_and_tangent(config, idx: int):
    from iddiff.data.synthetic import fixed_squares_constants

    d = config.data
    img = int(d.image_size)
    seed = int(config.seed)
    masks = np.asarray(fixed_squares_constants(
        d.num_squares, list(d.square_range), img, seed))  # (K, H*W) or (K,H,W)
    masks = masks.reshape(masks.shape[0], -1)
    base = jax.random.fold_in(jax.random.PRNGKey(seed), 0x1DD1FF)
    key = jax.random.fold_in(base, idx)
    coeffs = np.asarray(jax.random.uniform(key, (masks.shape[0],)))
    x = (coeffs @ masks).reshape(img, img, 1).astype(np.float32)
    return x, masks.T.astype(np.float64)  # (d, K) tangent columns


def orthonormal(T):
    q, _ = np.linalg.qr(T)
    return q


def probe(which, config, datamodule, sde, eps, score_fn, n_points, B=256):
    data_shape = (config.data.image_size, config.data.image_size, 1)
    d = int(math.prod(data_shape))
    num_batches = 4 * d // B  # K = 4d exactly
    fn = gram_fn(sde, score_fn, data_shape, B, num_batches, with_vectors=True)
    point_fn = (blobs_point_and_tangent if which == "blobs"
                else squares_point_and_tangent)
    dc = np.ones(d) / math.sqrt(d)
    out = []
    for idx in range(n_points):
        x, T = point_fn(config, idx)
        Q = orthonormal(T)
        sv, vecs = fn(jax.random.PRNGKey(1000 + idx), jnp.asarray(x),
                      jnp.float32(eps))
        sv = np.asarray(sv); vecs = np.asarray(vecs)  # vecs asc columns
        print(f"\n[{which} point {idx}] spectrum tail: "
              f"{np.array2string(sv[-14:], precision=1)}")
        print(" rank | sing.val | ‖P_tangent v‖ | |<v,DC>| ")
        rows = []
        for j in range(14):
            v = vecs[:, j]            # j-th smallest
            tang = float(np.linalg.norm(Q.T @ v))
            dcov = float(abs(dc @ v))
            svj = float(sv[d - 1 - j])
            rows.append((j, svj, tang, dcov))
            print(f"  {j:3d} | {svj:8.1f} | {tang:11.3f} | {dcov:8.3f}")
        out.append({"point": idx, "rows": rows, "spectrum_tail": sv[-20:]})
    return out


def sweep(which, config, datamodule, sde, eps, score_fn, n_points, B=256):
    from iddiff.id.readout import dims_from_spectra

    data_shape = (config.data.image_size, config.data.image_size, 1)
    d = int(math.prod(data_shape))
    point_fn = (blobs_point_and_tangent if which == "blobs"
                else squares_point_and_tangent)
    xs = [point_fn(config, i)[0] for i in range(n_points)]

    sigma_min, sigma_max = float(sde.sigma_min), float(sde.sigma_max)

    def t_of_sigma(s):
        return math.log(s / sigma_min) / math.log(sigma_max / sigma_min)

    cells = []
    for mult in (0.5, 1.0, 2.0, 4.0):          # VERDICT's literal t sweep
        cells.append((4, mult * eps, f"K=4d t={mult}×eps"))
    for km in (2, 8):                          # K sweep at t=eps
        cells.append((km, eps, f"K={km}d t=eps"))
    for s in (0.03, 0.1, 0.3):                 # σ-decade sweep at K=4d
        cells.append((4, t_of_sigma(s), f"K=4d σ={s}"))

    fns = {}
    results = {}
    print(f"\n=== sweep on {which} ({n_points} points/cell) ===")
    print(f"{'cell':22s} | ref | log_gap | ref,tail64 | ref,tail32 | σ(t)")
    for km, t, label in cells:
        if km not in fns:
            fns[km] = gram_fn(sde, score_fn, data_shape, B, km * d // B,
                              with_vectors=False)
        sv = np.stack([
            np.asarray(fns[km](jax.random.PRNGKey(7000 + i), jnp.asarray(x),
                               jnp.float32(t)))
            for i, x in enumerate(xs)])
        ref = np.median(dims_from_spectra(sv, rule="reference"))
        lg = np.median(dims_from_spectra(sv, rule="log_gap"))
        t64 = np.median(dims_from_spectra(sv, rule="reference", tail=64))
        t32 = np.median(dims_from_spectra(sv, rule="reference", tail=32))
        sig = sigma_min * (sigma_max / sigma_min) ** t
        print(f"{label:22s} | {ref:3.0f} | {lg:7.0f} | {t64:10.0f} |"
              f" {t32:10.0f} | {sig:.4f}")
        results[label] = {"singular_values": sv, "t": t, "K": km * d,
                          "ref": float(ref), "log_gap": float(lg),
                          "ref_tail64": float(t64), "ref_tail32": float(t32)}
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", choices=["blobs", "squares"], default="blobs")
    ap.add_argument("--phase", choices=["probe", "sweep", "all"], default="all")
    ap.add_argument("--probe_points", type=int, default=3)
    ap.add_argument("--sweep_points", type=int, default=20)
    args = ap.parse_args()

    config, dm, sde, eps, score_fn = load_run(args.ckpt)
    os.makedirs("artifacts/diagnosis", exist_ok=True)
    art = {}
    if args.phase in ("probe", "all"):
        art["probe"] = probe(args.ckpt, config, dm, sde, eps, score_fn,
                             args.probe_points)
    if args.phase in ("sweep", "all"):
        art["sweep"] = sweep(args.ckpt, config, dm, sde, eps, score_fn,
                             args.sweep_points)
    out = f"artifacts/diagnosis/{args.ckpt}_straggler.pkl"
    with open(out, "wb") as f:
        pickle.dump(art, f)
    print(f"\nsaved {out}")


if __name__ == "__main__":
    main()
