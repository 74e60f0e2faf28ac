"""Forward / reverse SDE definitions (VE, VP, sub-VP, SNR) as pure JAX math.

Functional re-design of the reference's `sde_lib.py` (/root/reference/sde_lib.py:7-445):
every method is a pure function of (x, t) with explicit PRNG keys, suitable
for closing over inside `jax.jit` / `lax.scan`.  Per-batch scalars (std,
diffusion) are returned with shape (B,) and broadcast via
`iddiff.utils.batch_mul`, replacing the reference's
``std[(...,) + (None,)*k]`` idiom.

Time conventions match the reference exactly:
  - t ∈ [eps, T] with T = 1 for all SDEs.
  - VESDE:  σ(t) = σ_min (σ_max/σ_min)^t                (sde_lib.py:342-347)
  - VPSDE:  β(t) = β_0 + t(β_1-β_0); log-mean-coeff     (sde_lib.py:250-254)
  - subVP:  std = 1 - exp(2·log_mean_coeff)  (NOTE: the reference keeps the
            un-square-rooted value here, sde_lib.py:300-304 — we mirror it)
  - SNRSDE: γ(t)=a·t+b·t^c normalized to log-SNR endpoints (sde_lib.py:153-196)
"""
from __future__ import annotations

import math
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from iddiff.utils import batch_mul

Array = jax.Array


class SDE:
    """Base class: dx = f(x,t) dt + g(t) dW with known marginal p_t(x|x_0).

    Unlike the reference's abstract class (sde_lib.py:7-109), instances are
    stateless value objects closed over at trace time; all randomness is
    explicit via PRNG keys.
    """

    T: float = 1.0

    def __init__(self, N: int = 1000):
        self.N = int(N)

    # --- to be overridden -------------------------------------------------
    def sde(self, x: Array, t: Array) -> Tuple[Array, Array]:
        """Drift f(x,t) (shape of x) and diffusion g(t) (shape (B,))."""
        raise NotImplementedError

    def marginal_prob(self, x: Array, t: Array) -> Tuple[Array, Array]:
        """Mean (shape of x) and std (shape (B,)) of p_t(x_t | x_0=x)."""
        raise NotImplementedError

    def prior_sampling(self, rng: Array, shape) -> Array:
        raise NotImplementedError

    def prior_logp(self, z: Array) -> Array:
        raise NotImplementedError

    # --- shared machinery --------------------------------------------------
    def perturb(self, rng: Array, x0: Array, t: Array) -> Array:
        """Sample x_t ~ p_t(x|x_0).  (sde_lib.py:33-38)"""
        z = jax.random.normal(rng, x0.shape, dtype=x0.dtype)
        mean, std = self.marginal_prob(x0, t)
        return mean + batch_mul(std, z)

    def discretize(self, x: Array, t: Array) -> Tuple[Array, Array]:
        """Euler–Maruyama discretization x_{i+1} = x_i + f_i + G_i z.

        (sde_lib.py:56-70)
        """
        dt = 1.0 / self.N
        drift, diffusion = self.sde(x, t)
        return drift * dt, diffusion * math.sqrt(dt)

    def reverse(self, score_fn: Callable, probability_flow: bool = False):
        return ReverseSDE(self, score_fn, probability_flow)


class ReverseSDE:
    """Reverse-time SDE/ODE built from a forward SDE and a score function.

    Functional equivalent of the on-the-fly RSDE subclass in the reference
    (sde_lib.py:72-109).  `score_fn(x, t)` must return the true score.
    """

    def __init__(self, fwd: SDE, score_fn: Callable, probability_flow: bool):
        self.fwd = fwd
        self.score_fn = score_fn
        self.probability_flow = probability_flow
        self.N = fwd.N
        self.T = fwd.T

    def sde(self, x: Array, t: Array) -> Tuple[Array, Array]:
        drift, diffusion = self.fwd.sde(x, t)
        score = self.score_fn(x, t)
        coeff = 0.5 if self.probability_flow else 1.0
        drift = drift - batch_mul(diffusion**2, score) * coeff
        diffusion = jnp.zeros_like(diffusion) if self.probability_flow else diffusion
        return drift, diffusion

    def discretize(self, x: Array, t: Array) -> Tuple[Array, Array]:
        f, G = self.fwd.discretize(x, t)
        coeff = 0.5 if self.probability_flow else 1.0
        rev_f = f - batch_mul(G**2, self.score_fn(x, t)) * coeff
        rev_G = jnp.zeros_like(G) if self.probability_flow else G
        return rev_f, rev_G


def _gaussian_logp(z: Array, var: float) -> Array:
    d = math.prod(z.shape[1:])
    reduce_dims = tuple(range(1, z.ndim))
    return (
        -d / 2.0 * jnp.log(2 * jnp.pi * var)
        - jnp.sum(z**2, axis=reduce_dims) / (2 * var)
    )


class VESDE(SDE):
    """Variance-exploding SDE: σ(t) = σ_min (σ_max/σ_min)^t.

    (sde_lib.py:316-389; `data_mean` shifts the prior, sde_lib.py:330,367-373.)
    """

    def __init__(self, sigma_min=0.01, sigma_max=50.0, N=1000, data_mean=None):
        super().__init__(N)
        self.sigma_min = float(sigma_min)
        self.sigma_max = float(sigma_max)
        self.data_mean = None if data_mean is None else jnp.asarray(data_mean)

    def sigma(self, t: Array) -> Array:
        return self.sigma_min * (self.sigma_max / self.sigma_min) ** t

    def discrete_sigma(self, timestep: Array) -> Array:
        """Geometric ladder σ_i = exp(linspace(log σ_min, log σ_max, N))[i].

        Closed form — no gather from a table (TPU-friendly); identical to the
        reference's `discrete_sigmas` (sde_lib.py:327).
        """
        frac = timestep.astype(jnp.float32) / (self.N - 1)
        return self.sigma_min * (self.sigma_max / self.sigma_min) ** frac

    def sde(self, x, t):
        sigma = self.sigma(t)
        drift = jnp.zeros_like(x)
        diffusion = sigma * jnp.sqrt(
            2 * (math.log(self.sigma_max) - math.log(self.sigma_min))
        )
        diffusion = jnp.broadcast_to(diffusion, t.shape)
        return drift, diffusion

    def marginal_prob(self, x, t):
        return x, jnp.broadcast_to(self.sigma(t), t.shape)

    def compute_backward_kernel(self, x0, x_tplustau, t, tau):
        """Parameters of p(x_t | x_0, x_{t+τ}) (sde_lib.py:349-365)."""
        s_t2 = self.sigma(t) ** 2
        s_tt2 = self.sigma(t + tau) ** 2
        std_b = jnp.sqrt(s_t2 * (s_tt2 - s_t2) / s_tt2)
        mean_b = batch_mul((s_tt2 - s_t2) / s_tt2, x0) + batch_mul(
            s_t2 / s_tt2, x_tplustau
        )
        return mean_b, std_b

    def prior_sampling(self, rng, shape):
        z = jax.random.normal(rng, shape) * self.sigma_max
        if self.data_mean is not None:
            z = z + self.data_mean[None]
        return z

    def prior_logp(self, z):
        return _gaussian_logp(z, self.sigma_max**2)

    # NOTE: the reference's VESDE has its SMLD discretize commented out
    # (sde_lib.py:381-389), so VESDE inherits the base Euler–Maruyama
    # discretize; only cVESDE overrides it (sde_lib.py:437-445).


class CVESDE(VESDE):
    """Conditional VESDE (sde_lib.py:391-445): same math, conditional score.

    The reverse SDE takes score_fn(x, y, t)."""

    def reverse(self, score_fn, probability_flow=False):
        return ConditionalReverseSDE(self, score_fn, probability_flow)

    def discretize(self, x, t):
        """SMLD (NCSN) discretization (sde_lib.py:437-445)."""
        timestep = (t * (self.N - 1) / self.T).astype(jnp.int32)
        sigma = self.discrete_sigma(timestep)
        adjacent = jnp.where(
            timestep == 0, jnp.zeros_like(sigma), self.discrete_sigma(timestep - 1)
        )
        f = jnp.zeros_like(x)
        G = jnp.sqrt(sigma**2 - adjacent**2)
        return f, G


class ConditionalReverseSDE(ReverseSDE):
    """Reverse SDE whose drift/discretize take (x, y, t) (sde_lib.py:111-149)."""

    def sde(self, x, y, t):  # type: ignore[override]
        drift, diffusion = self.fwd.sde(x, t)
        score = self.score_fn(x, y, t)
        coeff = 0.5 if self.probability_flow else 1.0
        drift = drift - batch_mul(diffusion**2, score) * coeff
        diffusion = jnp.zeros_like(diffusion) if self.probability_flow else diffusion
        return drift, diffusion

    def discretize(self, x, y, t):  # type: ignore[override]
        f, G = self.fwd.discretize(x, t)
        coeff = 0.5 if self.probability_flow else 1.0
        rev_f = f - batch_mul(G**2, self.score_fn(x, y, t)) * coeff
        rev_G = jnp.zeros_like(G) if self.probability_flow else G
        return rev_f, rev_G


class VPSDE(SDE):
    """Variance-preserving SDE with linear β schedule (sde_lib.py:222-273)."""

    def __init__(self, beta_min=0.1, beta_max=20.0, N=1000):
        super().__init__(N)
        self.beta_0 = float(beta_min)
        self.beta_1 = float(beta_max)
        self.discrete_betas = jnp.linspace(beta_min / N, beta_max / N, N)
        self.alphas = 1.0 - self.discrete_betas
        self.alphas_cumprod = jnp.cumprod(self.alphas)
        self.sqrt_alphas_cumprod = jnp.sqrt(self.alphas_cumprod)
        self.sqrt_1m_alphas_cumprod = jnp.sqrt(1.0 - self.alphas_cumprod)

    def beta(self, t: Array) -> Array:
        return self.beta_0 + t * (self.beta_1 - self.beta_0)

    def log_mean_coeff(self, t: Array) -> Array:
        return -0.25 * t**2 * (self.beta_1 - self.beta_0) - 0.5 * t * self.beta_0

    def sde(self, x, t):
        beta_t = self.beta(t)
        drift = batch_mul(-0.5 * beta_t, x)
        return drift, jnp.sqrt(beta_t)

    def marginal_prob(self, x, t):
        lmc = self.log_mean_coeff(t)
        mean = batch_mul(jnp.exp(lmc), x)
        std = jnp.sqrt(1.0 - jnp.exp(2.0 * lmc))
        return mean, std

    def prior_sampling(self, rng, shape):
        return jax.random.normal(rng, shape)

    def prior_logp(self, z):
        return _gaussian_logp(z, 1.0)

    def discretize(self, x, t):
        """DDPM discretization (sde_lib.py:265-273)."""
        timestep = (t * (self.N - 1) / self.T).astype(jnp.int32)
        beta = self.discrete_betas[timestep]
        alpha = self.alphas[timestep]
        f = batch_mul(jnp.sqrt(alpha), x) - x
        G = jnp.sqrt(beta)
        return f, G


class SubVPSDE(SDE):
    """Sub-VP SDE (sde_lib.py:276-313).

    NOTE: the reference returns std = 1 - exp(2·log_mean_coeff) WITHOUT the
    square root (sde_lib.py:303); we reproduce that behaviour for parity.
    """

    def __init__(self, beta_min=0.1, beta_max=20.0, N=1000):
        super().__init__(N)
        self.beta_0 = float(beta_min)
        self.beta_1 = float(beta_max)

    def sde(self, x, t):
        beta_t = self.beta_0 + t * (self.beta_1 - self.beta_0)
        drift = batch_mul(-0.5 * beta_t, x)
        discount = 1.0 - jnp.exp(
            -2 * self.beta_0 * t - (self.beta_1 - self.beta_0) * t**2
        )
        return drift, jnp.sqrt(beta_t * discount)

    def marginal_prob(self, x, t):
        lmc = -0.25 * t**2 * (self.beta_1 - self.beta_0) - 0.5 * t * self.beta_0
        mean = batch_mul(jnp.exp(lmc), x)
        std = 1.0 - jnp.exp(2.0 * lmc)
        return mean, std

    def prior_sampling(self, rng, shape):
        return jax.random.normal(rng, shape)

    def prior_logp(self, z):
        return _gaussian_logp(z, 1.0)


class SNRSDE(SDE):
    """Variational-Diffusion-style log-SNR parameterized SDE (sde_lib.py:153-196).

    γ(t) = a·t + b·t^c, normalized so -log SNR runs from minus_log_SNR_0 to
    minus_log_SNR_1 over t ∈ [0, 1].
    """

    def __init__(self, N=1000, a=2.0, b=3.0, c=6.0, minus_log_SNR_0=-10.0,
                 minus_log_SNR_1=5.0):
        super().__init__(N)
        self.a, self.b, self.c = float(a), float(b), float(c)
        gamma = lambda t: self.a * t + self.b * t**self.c
        d_gamma = lambda t: self.a + self.b * self.c * t ** (self.c - 1)
        norm = (minus_log_SNR_1 - minus_log_SNR_0) / (gamma(1.0) - gamma(0.0))
        self.log_SNR = lambda t: -(minus_log_SNR_0 + norm * (gamma(t) - gamma(0.0)))
        self.d_log_SNR = lambda t: -norm * d_gamma(t)

    def sde(self, x, t):
        snr = jnp.exp(self.log_SNR(t))
        std2 = 1.0 / (1.0 + snr)
        drift = batch_mul(0.5 * std2 * self.d_log_SNR(t), x)
        diffusion = jnp.sqrt(-std2 * self.d_log_SNR(t))
        return drift, diffusion

    def marginal_prob(self, x, t):
        snr = jnp.exp(self.log_SNR(t))
        alpha = jnp.sqrt(snr / (1.0 + snr))
        mean = batch_mul(alpha, x)
        std = jnp.sqrt(1.0 / (1.0 + snr))
        return mean, std

    def prior_sampling(self, rng, shape):
        return jax.random.normal(rng, shape)

    def prior_logp(self, z):
        return _gaussian_logp(z, 1.0)


def get_sde(config, conditional: bool = False):
    """Config → (sde, sampling_eps).

    Mirrors `BaseSdeGenerativeModel.configure_sde`
    (/root/reference/lightning_modules/BaseSdeGenerativeModel.py:27-47):
    vpsde/subvpsde → eps=1e-3, vesde/snrsde → eps=1e-5.

    conditional=True mirrors ConditionalSdeGenerativeModel.configure_sde
    (ConditionalSdeGenerativeModel.py:17-41): VESDE becomes a cVESDE for x
    (+ a VESDE for y unless conditioning_approach == 'sr3').
    """
    name = config.training.sde.lower()
    if conditional and name == "vesde":
        sde_x = CVESDE(
            sigma_min=config.model.sigma_min_x,
            sigma_max=config.model.sigma_max_x,
            N=config.model.num_scales,
        )
        if config.training.get("conditioning_approach", "ve") == "sr3":
            return sde_x, 1e-5
        sde_y = VESDE(
            sigma_min=config.model.sigma_min_y,
            sigma_max=config.model.sigma_max_y,
            N=config.model.num_scales,
        )
        return {"x": sde_x, "y": sde_y}, 1e-5
    if name == "vpsde":
        sde = VPSDE(
            beta_min=config.model.beta_min,
            beta_max=config.model.beta_max,
            N=config.model.num_scales,
        )
        eps = 1e-3
    elif name == "subvpsde":
        sde = SubVPSDE(
            beta_min=config.model.beta_min,
            beta_max=config.model.beta_max,
            N=config.model.num_scales,
        )
        eps = 1e-3
    elif name == "vesde":
        data_mean = None
        if config.data.get("use_data_mean", False):
            data_mean = config.data.get("data_mean", None)
        sde = VESDE(
            sigma_min=config.model.sigma_min,
            sigma_max=config.model.sigma_max,
            N=config.model.num_scales,
            data_mean=data_mean,
        )
        eps = 1e-5
    elif name == "snrsde":
        sde = SNRSDE(N=config.model.num_scales)
        eps = 1e-5
    else:
        raise NotImplementedError(f"SDE '{name}' unknown")
    return sde, eps
