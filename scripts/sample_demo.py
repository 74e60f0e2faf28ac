"""Unconditional PC sampling from a trained image checkpoint → grid PNG.

Visual end-to-end proof that the sampling stack works on a REAL trained
image model (reference analogue: pl_module.sample() used by the
visualization callbacks, sampling/unconditional.py:160-195): restores a
paper-run checkpoint, draws samples with the reverse-diffusion PC
sampler, and saves a grid next to real training samples for comparison.

  python scripts/sample_demo.py --ckpt blobs --n 16
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", choices=["blobs", "blobs20", "squares"],
                    default="blobs")
    ap.add_argument("--n", type=int, default=16)
    # predictor-only is the reference path for these image configs
    # (gaussian_blobs/10.py:74-75: euler_maruyama + corrector 'none');
    # langevin at snr=0.15 diverges on the blobs model (RESULTS.md)
    ap.add_argument("--corrector", default="none")
    ap.add_argument("--snr", type=float, default=0.15)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo/scripts")
    from diagnose_straggler import load_run

    import importlib.util

    if args.ckpt == "blobs20":
        spec = importlib.util.spec_from_file_location(
            "b20e", "/root/repo/cluster/runs/blobs20_estimate.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        config = mod.get_config()
        from iddiff.data import create_datamodule
        from iddiff.models import create_model
        from iddiff.run_lib import _restore_eval_params, get_sde

        dm = create_datamodule(config); dm.setup()
        model = create_model(config)
        sde, eps = get_sde(config)
        params = _restore_eval_params(config, model, dm,
                                      config.model.checkpoint_path)
    else:
        config, dm, sde, eps, _sf = load_run(args.ckpt)
        from iddiff.models import create_model
        from iddiff.run_lib import _restore_eval_params

        model = create_model(config)
        params = _restore_eval_params(config, model, dm,
                                      config.model.checkpoint_path)

    from iddiff.sampling import get_pc_sampler

    img = int(config.data.image_size)
    shape = (args.n, img, img, 1)
    sampler = get_pc_sampler(
        sde, model, shape, predictor="reverse_diffusion",
        corrector=args.corrector, snr=args.snr, eps=eps)
    samples = np.asarray(jax.jit(sampler)(jax.random.PRNGKey(0), params))
    print(f"samples: shape={samples.shape} range=[{samples.min():.3f}, "
          f"{samples.max():.3f}] mean={samples.mean():.3f}")

    # real training samples for visual comparison
    if getattr(dm, "virtual", False):
        real = np.asarray(dm._gen_np(np.arange(args.n)))
    else:
        real = np.asarray(dm.train_data[: args.n])

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    ncol = int(np.ceil(np.sqrt(args.n)))
    fig, axes = plt.subplots(2 * ncol, ncol, figsize=(ncol * 1.6, 2 * ncol * 1.6))
    for i in range(ncol * ncol):
        r, c = divmod(i, ncol)
        for block, arr in ((0, samples), (ncol, real)):
            ax = axes[r + block][c]
            ax.axis("off")
            if i < arr.shape[0]:
                ax.imshow(arr[i, ..., 0], cmap="viridis")
    axes[0][0].set_title("PC samples", fontsize=9, loc="left")
    axes[ncol][0].set_title("training data", fontsize=9, loc="left")
    out = args.out or f"artifacts/diagnosis/{args.ckpt}_pc_samples.png"
    os.makedirs(os.path.dirname(out), exist_ok=True)
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print(f"saved {out}")


if __name__ == "__main__":
    main()
