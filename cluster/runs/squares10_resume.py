"""squares-10 paper-run continuation (VERDICT r2 item 1 / r3 item 2).

Round 2 trained the full paper model to 200k steps; round 4 continued to
328k (spectra archived under artifacts/squares10_trajectory/) before a
host re-provision wiped the gitignored checkpoint.  This config therefore
works in BOTH states:

- if the workdir's pickled run config survives, resume it exactly (the
  round-2/4 behavior);
- otherwise rebuild the identical run from the checked-in paper config
  (reference: /root/reference/configs/dimension_estimation/paper/
  image_data/squares/10.py — nf=128, ch_mult (1,2,2,2), 4 res blocks,
  dropout 0.1, VESDE sigma in [0.01, 50], 500k samples, batch 128,
  lr 2e-4 + 5k warmup), with the in-training 5-point spectrum hook and
  the same workdir so --resume picks up whatever checkpoint exists.

Budget: 500k steps (paper budget is 2.5M; the 11->10 crossing is the
target, measured by the archived spectra trajectory).
"""
import os
import pickle

_PKL = "/root/repo/logs/squares_paper/10/config.pkl"


def _rebuild():
    from iddiff.configs.dimension_estimation.squares import (
        paper_budget,
        squares_config,
    )

    c = paper_budget(squares_config(10, kind="squares"))
    c.logging.log_path = "/root/repo/logs/squares_paper"
    c.logging.log_name = "10"
    # in-training 5-point spectrum hook, step-keyed pickles (svd/steps_*.pkl)
    c.logging.svd_frequency = 8  # epochs between spectrum probes
    c.logging.svd_points = 5
    c.logging.save_svd = True
    c.logging.every_n_epochs = 8
    c.logging.top_k = 3
    c.data.cache_generated = True
    # TPU-native hot loop (see blobs10_run.py): on-device batch synthesis +
    # scan-fused steps.  NOTE: flips the per-sample RNG realization of the
    # 500k-sample dataset vs the round-2 numpy dataset (same manifold
    # constants, same distribution — PARITY.md); the wiped round-2/4
    # checkpoints force a from-scratch run anyway.
    c.data.on_device_generation = True
    c.logging.eval_freq_epochs = 4
    return _apply_fast_path(c)


def _apply_fast_path(c):
    """Used when resuming from a surviving pickled config: layer the
    round-4 fast-path flags onto it."""
    import datetime

    c.data.on_device_generation = True
    c.logging.eval_freq_epochs = 4
    # wall-clock 'last' cadence: the epoch cadence alone (every 8 epochs
    # = 25k steps ~ 38 min) left the 25-min auto-archiver up to an hour
    # stale across host rebuilds; 15-min saves bound the loss at ~40 min
    c.logging.envery_timedelta = datetime.timedelta(minutes=15)
    return c


def get_config():
    if os.path.exists(_PKL):
        with open(_PKL, "rb") as f:
            c = pickle.load(f)
        _apply_fast_path(c)
    else:
        c = _rebuild()
    c.training.n_iters = 500_000
    return c
