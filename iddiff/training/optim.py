"""Optimizer chain: warmup → global-norm clip → Adam(W).

Mirrors the reference's effective optimization:
  - Adam with (beta1, 0.999), eps, weight_decay (/root/reference/losses.py:26-35)
  - per-step warmup lr·min(step/warmup, 1)
    (lightning_modules/BaseSdeGenerativeModel.py:86-107)
  - gradient clipping via Trainer(gradient_clip_val) (run_lib.py:62)
  - gradient accumulation (run_lib.py:61) via optax.MultiSteps
"""
from __future__ import annotations

import optax


def make_optimizer(config) -> optax.GradientTransformation:
    o = config.optim
    if o.optimizer.lower() != "adam":
        raise NotImplementedError(f"Optimizer '{o.optimizer}' not supported")

    warmup = int(o.get("warmup", 0))
    lr = float(o.lr)
    if warmup > 0:
        schedule = optax.linear_schedule(0.0, lr, transition_steps=warmup)
    else:
        schedule = lr

    parts = []
    grad_clip = float(o.get("grad_clip", -1.0))
    if grad_clip >= 0:
        parts.append(optax.clip_by_global_norm(grad_clip))
    wd = float(o.get("weight_decay", 0.0))
    if wd > 0:
        parts.append(
            optax.adamw(schedule, b1=o.beta1, b2=0.999, eps=o.eps, weight_decay=wd)
        )
    else:
        parts.append(optax.adam(schedule, b1=o.beta1, b2=0.999, eps=o.eps))
    tx = optax.chain(*parts)

    accum = int(config.training.get("accumulate_grad_batches", 1))
    if accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    return tx
