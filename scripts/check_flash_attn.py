"""Real-TPU parity + benchmark for the flash-attention path (AttnBlock).

Run on the chip (takes ~2 min):
    python scripts/check_flash_attn.py

1. parity: Pallas flash kernel vs the XLA einsum attention on the DDPM
   attention shape (B=128, HW=256, C in {128, 256}).
2. end-to-end: the d=1024 DDPM U-Net score forward, flash on vs off —
   the number that decides the default (profiler attributed ~25% of device
   time to add/reduce fusions incl. the attention softmax,
   artifacts/profile_image_id.md).

Decision rule (same as the fused GroupNorm, scripts/check_fused_gn.py):
the flag flips on only if the END-TO-END forward is faster; per-op
microbenchmarks on the tunneled backend measure dispatch latency, not
kernel time.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from iddiff.kernels.attention import attention, set_flash_attention


def _sync(x):
    return np.asarray(x)


def main():
    assert jax.devices()[0].platform == "tpu", "run this on the chip"
    rng = np.random.default_rng(0)
    failed = False

    print("== parity (flash vs einsum) ==")
    for B, L, C in [(128, 256, 128), (128, 256, 256), (8, 1024, 128)]:
        q, k, v = (jnp.asarray(rng.normal(size=(B, L, C)).astype(np.float32))
                   for _ in range(3))
        set_flash_attention(False)
        want = _sync(jax.jit(attention)(q, k, v))
        set_flash_attention(True)
        got = _sync(jax.jit(attention)(q, k, v))
        set_flash_attention(False)
        err = float(np.max(np.abs(got - want)))
        ok = err < 2e-3
        failed = failed or not ok
        print(f"  {'OK ' if ok else 'FAIL'} (B={B}, L={L}, C={C}): "
              f"max_abs_err={err:.2e}")

    print("== end-to-end DDPM d=1024 score forward ==")
    from iddiff.configs.dimension_estimation.mnist import get_config
    from iddiff.models import create_model, get_score_fn
    from iddiff.sde import get_sde

    config = get_config()
    B = 128
    model = create_model(config)
    sde, eps = get_sde(config)
    x0 = jnp.ones((B, 32, 32, 1), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x0, jnp.zeros((B,)))["params"]
    vec_t = jnp.full((B,), eps, jnp.float32)
    xin = jnp.asarray(rng.normal(size=(B, 32, 32, 1)).astype(np.float32))

    outs = {}
    for flash in (False, True):
        set_flash_attention(flash)
        score = jax.jit(get_score_fn(sde, model, params, train=False))
        _sync(score(xin, vec_t))
        t0 = time.perf_counter()
        for _ in range(20):
            y = score(xin, vec_t)
        _sync(y)
        dt = (time.perf_counter() - t0) / 20
        outs[flash] = (dt, np.asarray(y))
        print(f"  flash={flash}: {dt * 1e3:.2f} ms/fwd (B={B})")
    set_flash_attention(False)
    err = float(np.max(np.abs(outs[True][1] - outs[False][1])))
    failed = failed or err >= 2e-3
    print(f"  fwd speedup: {outs[False][0] / outs[True][0]:.3f}x, "
          f"max_abs_out_err={err:.2e}")
    if failed:
        raise SystemExit("PARITY FAIL — do not enable IDDIFF_FLASH_ATTN")


if __name__ == "__main__":
    main()
