"""On-device adaptive ODE integration (Dormand–Prince RK45).

Replaces the reference's scipy.integrate.solve_ivp round-trips
(/root/reference/sampling/unconditional.py:66-131, likelihood.py:103-117):
there every RHS evaluation crossed GPU→numpy→GPU; here the whole adaptive
loop is a lax.while_loop compiled on device with static shapes.

The integrator works on a single flat state vector; callers pack/unpack.
Step-size control follows the classic embedded-pair scheme with a PI-style
safety factor, matching scipy's RK45 defaults (rtol=1e-5, atol=1e-5 used by
the reference).
"""
from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

# Dormand–Prince 5(4) Butcher tableau.
_C = jnp.array([0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0])
_A = [
    jnp.array([]),
    jnp.array([1 / 5]),
    jnp.array([3 / 40, 9 / 40]),
    jnp.array([44 / 45, -56 / 15, 32 / 9]),
    jnp.array([19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729]),
    jnp.array([9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656]),
    jnp.array([35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84]),
]
_B5 = jnp.array([35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0])
_B4 = jnp.array(
    [5179 / 57600, 0.0, 7571 / 16695, 393 / 640, -92097 / 339200, 187 / 2100, 1 / 40]
)


class ODEResult(NamedTuple):
    y: jax.Array
    nfev: jax.Array
    nsteps: jax.Array


def odeint_rk45(f: Callable, y0: jax.Array, t0: float, t1: float,
                rtol: float = 1e-5, atol: float = 1e-5,
                max_steps: int = 10_000) -> ODEResult:
    """Integrate dy/dt = f(t, y) from t0 to t1 (t1 < t0 allowed)."""
    direction = jnp.sign(jnp.asarray(t1 - t0, dtype=y0.dtype))
    span = jnp.abs(jnp.asarray(t1 - t0, dtype=y0.dtype))

    def scaled_err(y, y_new, err):
        tol = atol + rtol * jnp.maximum(jnp.abs(y), jnp.abs(y_new))
        return jnp.sqrt(jnp.mean((err / tol) ** 2))

    def rk_step(t, y, h):
        ks = []
        for i in range(7):
            ti = t + _C[i] * h
            yi = y
            for j, a in enumerate(_A[i]):
                yi = yi + h * a * ks[j]
            ks.append(f(ti, yi))
        k = jnp.stack(ks)
        y5 = y + h * jnp.tensordot(_B5, k, axes=1)
        y4 = y + h * jnp.tensordot(_B4, k, axes=1)
        return y5, y5 - y4

    h0 = direction * span * 1e-3

    def cond(state):
        t, y, h, nfev, nsteps, done = state
        return jnp.logical_and(~done, nsteps < max_steps)

    def body(state):
        t, y, h, nfev, nsteps, done = state
        # clamp step to not overshoot t1
        h = direction * jnp.minimum(jnp.abs(h), jnp.abs(t1 - t))
        y_new, err = rk_step(t, y, h)
        err_norm = scaled_err(y, y_new, err)
        accept = err_norm <= 1.0
        t_new = jnp.where(accept, t + h, t)
        y_out = jnp.where(accept, y_new, y)
        # PI controller: factor in [0.2, 10] with safety 0.9
        factor = jnp.clip(
            0.9 * (jnp.maximum(err_norm, 1e-10)) ** (-0.2), 0.2, 10.0
        )
        h_new = h * factor
        done_new = jnp.abs(t_new - t0) >= span * (1 - 1e-12)
        return (t_new, y_out, h_new, nfev + 7, nsteps + 1, done_new)

    state = (jnp.asarray(t0, dtype=y0.dtype), y0, h0,
             jnp.array(0, jnp.int32), jnp.array(0, jnp.int32),
             jnp.array(False))
    t, y, h, nfev, nsteps, done = jax.lax.while_loop(cond, body, state)
    return ODEResult(y=y, nfev=nfev, nsteps=nsteps)
