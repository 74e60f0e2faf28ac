"""DPM-Solver++(2M): fast deterministic sampling in 15-50 net evals.

Beyond-reference capability (the reference's fastest path is the N=1000
PC loop, sampling/unconditional.py:165-199): a second-order multistep
solver for the probability-flow ODE in the data-prediction
parameterization (Lu et al. 2022, arXiv:2211.01095; see PAPERS.md for the
fast-solver lineage).  Works for any SDE exposing `marginal_prob` with
x-linear mean (VE: α=1, VP/subVP: α_t x), entirely as one `lax.scan` on
device.

Math.  With α_t, σ_t from marginal_prob and λ_t = log(α_t/σ_t), the
probability-flow ODE in the data prediction x0 = (x + σ² s)/α is linear;
the exact-in-x0 step from t_i to t_{i+1} is

    x_{i+1} = (σ_{i+1}/σ_i) x_i − α_{i+1} expm1(−h_i) D_i ,
    h_i = λ_{i+1} − λ_i ,

where D_i is the 2nd-order multistep extrapolation
D_i = (1 + 1/(2 r_i)) x0_i − x0_{i−1}/(2 r_i), r_i = h_{i−1}/h_i (first
step: D_0 = x0_0).  For VESDE (α=1) this reduces to the exact
x_{i+1} = (σ_{i+1}/σ_i) x_i + (1 − σ_{i+1}/σ_i) x0 update.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from iddiff.models import get_score_fn
from iddiff.utils import batch_mul


def _alpha_sigma(sde, t):
    """(α_t, σ_t) scalars for an x-linear marginal: mean = α_t · x."""
    one = jnp.ones((t.shape[0], 1), jnp.float32)
    mean, std = sde.marginal_prob(one, t)
    return mean[:, 0], std


def get_dpm_solver_sampler(sde, model, shape, *, steps: int = 25,
                           eps: float = 1e-3, continuous: bool = True,
                           time_spacing: str = "logsnr", denoise: bool = True):
    """`sampler(rng, params) -> x` using exactly `steps` score evaluations.

    With denoise=True the final evaluation is the data-prediction at eps
    (noise removal), so the solver grid has steps-1 transitions; with
    denoise=False all `steps` evaluations drive solver transitions
    (advisor r2 #5: NFE accounting matches the `steps` knob either way).
    """
    n_steps = steps - 1 if denoise else steps
    assert n_steps >= 1, "steps too small for denoise=True"

    # --- time grid (trace-time constants) --------------------------------
    if time_spacing == "logsnr":
        # uniform in λ: invert λ(t) on a dense grid
        dense = jnp.linspace(sde.T, eps, 4096)
        a_d, s_d = _alpha_sigma(sde, dense)
        lam_d = jnp.log(a_d / s_d)
        lam_grid = jnp.linspace(lam_d[0], lam_d[-1], n_steps + 1)
        # lam_d is increasing along dense (t decreasing); interp needs
        # increasing xp
        ts = jnp.interp(lam_grid, lam_d, dense)
    else:
        ts = jnp.linspace(sde.T, eps, n_steps + 1)
    alphas, sigmas = _alpha_sigma(sde, ts)
    lambdas = jnp.log(alphas / sigmas)

    def sampler(rng, params):
        score_fn = get_score_fn(sde, model, params, train=False,
                                continuous=continuous)

        def x0_pred(x, i):
            vec_t = jnp.full((shape[0],), ts[i], jnp.float32)
            s = score_fn(x, vec_t)
            # x0 = (x + σ² s)/α
            return batch_mul(x + batch_mul(sigmas[i] ** 2, s), 1.0 / alphas[i])

        x = sde.prior_sampling(rng, shape)

        # first step: 1st order (DPM-Solver++ 1S)
        x0_prev = x0_pred(x, 0)
        h_prev = lambdas[1] - lambdas[0]
        x = batch_mul(sigmas[1] / sigmas[0], x) - batch_mul(
            alphas[1] * jnp.expm1(-h_prev), x0_prev
        )

        def body(carry, i):
            x, x0_prev, h_prev = carry
            x0_i = x0_pred(x, i)
            h_i = lambdas[i + 1] - lambdas[i]
            r = h_prev / h_i
            D = batch_mul(1.0 + 1.0 / (2.0 * r), x0_i) - batch_mul(
                1.0 / (2.0 * r), x0_prev
            )
            x_next = batch_mul(sigmas[i + 1] / sigmas[i], x) - batch_mul(
                alphas[i + 1] * jnp.expm1(-h_i), D
            )
            return (x_next, x0_i, h_i), None

        (x, x0_last, _), _ = jax.lax.scan(
            body, (x, x0_prev, h_prev), jnp.arange(1, n_steps)
        )
        if denoise:
            # final data prediction at t=eps (noise removal)
            x = x0_pred(x, n_steps)
        return x

    return jax.jit(sampler)
