"""Real-TPU parity + microbenchmark for the fused GroupNorm(+swish) kernel.

Run on the chip (takes ~1 min):
    python scripts/check_fused_gn.py

1. parity: Pallas kernel vs the lax two-pass spec on the DDPM hot shapes
   (32x32x128 ... 8x8x256, fp32 and bf16).
2. microbench: per-call time (NOTE: on the tunneled axon backend this
   measures ~30ms dispatch latency, not kernel time — trust only the
   end-to-end number below).
3. end-to-end: the d=1024 DDPM U-Net score forward, fused on vs off.

MEASURED 2026-08-17 (v5e): parity holds (6e-3 fp32 one-pass drift, 1e-5 on
model outputs) but fused is 0.67x end-to-end — XLA's own fusion wins; the
flag stays off by default.  See kernels/group_norm.py docstring.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from iddiff.kernels.group_norm import (
    _pallas_group_norm_act,
    group_norm_act_reference,
    set_fused_groupnorm,
)


def _sync(x):
    return np.asarray(x)


def main():
    assert jax.devices()[0].platform == "tpu", "run this on the chip"
    rng = np.random.default_rng(0)

    print("== parity (pallas vs lax spec) ==")
    for shape in [(128, 32, 32, 128), (128, 16, 16, 256), (128, 8, 8, 256)]:
        for dtype in (jnp.float32, jnp.bfloat16):
            C = shape[-1]
            x = jnp.asarray(rng.normal(size=shape).astype(np.float32)).astype(dtype)
            s = jnp.asarray(1 + 0.1 * rng.normal(size=(C,)).astype(np.float32))
            b = jnp.asarray(0.1 * rng.normal(size=(C,)).astype(np.float32))
            want = group_norm_act_reference(
                x.astype(jnp.float32), s, b, 32, 1e-6, "swish")
            got = _pallas_group_norm_act(x, s, b, 32, 1e-6, "swish")
            err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - want)))
            # one-pass E[x^2]-E[x]^2 + hardware rsqrt: ~1e-2 class
            tol = 1e-2 if dtype == jnp.float32 else 5e-2
            status = "OK " if err < tol else "FAIL"
            print(f"  {status} {shape} {jnp.dtype(dtype).name}: max_abs_err={err:.2e}")

    print("== microbench (B=128, 32x32x128, fp32) ==")
    x = jnp.asarray(rng.normal(size=(128, 32, 32, 128)).astype(np.float32))
    s = jnp.ones((128,), jnp.float32)
    b = jnp.zeros((128,), jnp.float32)
    f_ref = jax.jit(lambda x: group_norm_act_reference(x, s, b, 32, 1e-6, "swish"))
    f_pal = jax.jit(lambda x: _pallas_group_norm_act(x, s, b, 32, 1e-6, "swish"))
    for name, f in [("xla-2pass", f_ref), ("pallas-fused", f_pal)]:
        _sync(f(x))
        t0 = time.perf_counter()
        for _ in range(50):
            y = f(x)
        _sync(y)
        dt = (time.perf_counter() - t0) / 50
        gb = 2 * x.size * 4 / 1e9
        print(f"  {name}: {dt * 1e6:.0f} us  ({gb / dt:.0f} GB/s effective)")

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
    for fused in (False, True):
        set_fused_groupnorm(fused)
        score = jax.jit(get_score_fn(sde, model, params, train=False))
        _sync(score(xin, vec_t))
        t0 = time.perf_counter()
        for _ in range(20):
            y = score(xin, vec_t)
        _sync(y)
        dt = (time.perf_counter() - t0) / 20
        outs[fused] = (dt, np.asarray(y))
        print(f"  fused={fused}: {dt * 1e3:.2f} ms/fwd (B={B})")
    set_fused_groupnorm(False)
    err = float(np.max(np.abs(outs[True][1] - outs[False][1])))
    print(f"  fwd speedup: {outs[False][0] / outs[True][0]:.3f}x, "
          f"max_abs_out_err={err:.2e}")


if __name__ == "__main__":
    main()
