"""Analytic ground-truth score of a uniform k-sphere — the framework's oracle.

Rebuild of /root/reference/models/ksphere_gt.py:7-27 (CPU numpy + scipy ive)
as pure, jittable JAX: the modified-Bessel ratio A_ν(x) = I_ν(x)/I_{ν-1}(x)
is computed with a backward (Miller-style) recurrence seeded by the Amos
uniform bound, accurate for all x ≥ 0 and fully vectorized, so the whole
no-training ID/sampling pipeline runs on TPU.

Math: for x uniform on r·S^{p-?}... the reference uses
  score(x, σ) = (x/r) · (A_{p/2}(r/σ²) − r) / σ²      (ksphere_gt.py:18-25)
with r = ‖x‖ and p = manifold_dim.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .registry import register_model


def bessel_iv_ratio(nu, x, depth: int = 40):
    """A_ν(x) = I_ν(x) / I_{ν-1}(x), elementwise, jittable.

    Uses the recurrence I_{ν-1}(x) = (2ν/x) I_ν(x) + I_{ν+1}(x), i.e.
      R_ν = 1 / (2ν/x + R_{ν+1}),
    evaluated downward from order ν+depth with the Amos (1974) approximation
      R_μ(x) ≈ x / (μ - 1/2 + sqrt(x² + (μ + 1/2)²))
    as the seed.  Backward recursion contracts the seed error, giving
    near-machine precision for all x (validated against scipy.special.ive
    in tests/test_oracle.py).
    """
    nu = jnp.asarray(nu, dtype=jnp.float32)
    x = jnp.asarray(x, dtype=jnp.float32)
    top = nu + depth
    r = x / (top - 0.5 + jnp.sqrt(x**2 + (top + 0.5) ** 2))

    def body(i, r):
        order = nu + (depth - 1 - i)
        return x / (2.0 * order + x * r)

    # r_{ν+k} -> r_{ν+k-1}: R_μ = 1/(2μ/x + R_{μ+1}) = x/(2μ + x R_{μ+1})
    r = jax.lax.fori_loop(0, depth, body, r)
    # Guard x == 0: I_ν(0)/I_{ν-1}(0) = 0 for ν ≥ 1.
    return jnp.where(x == 0.0, jnp.zeros_like(r), r)


def ksphere_score(x, sigma, manifold_dim: int):
    """Vectorized analytic score; x: (B, d), sigma: (B,) marginal std."""
    r = jnp.linalg.norm(x, axis=-1, keepdims=True)
    sigma = jnp.asarray(sigma, dtype=x.dtype).reshape(-1, 1)
    k = r / sigma**2
    a = bessel_iv_ratio(manifold_dim / 2.0, k)
    return (x / r) * (a - r) / sigma**2


@register_model(name="ksphere_gt")
class KSphereGT(nn.Module):
    """Oracle "model": forward(x, sigmas) returns the reference's score.

    Has one dummy parameter so optimizer/EMA plumbing works unchanged
    (mirroring the reference's `self.dummy = nn.Linear(1,1)`,
    ksphere_gt.py:12).

    NOTE on validity: this radial formula is the exact smoothed score only
    when the sphere has codimension 1 (ambient_dim = manifold_dim + 1); for
    a k-sphere embedded with higher codimension it describes a spherically
    symmetric density in the FULL ambient space (its ID estimate is then
    ≈ ambient_dim − 1, not k).  Use `ksphere_gt_exact` for a
    codimension-aware oracle.
    """

    config: object

    @nn.compact
    def __call__(self, x, sigmas, *, train: bool = False):
        _ = self.param("dummy", nn.initializers.zeros, (1,))
        return ksphere_score(x, sigmas, self.config.data.manifold_dim)


def ksphere_exact_score(x, sigma, q):
    """Exact score of N(0,σ²)-smoothed Uniform(S^k) embedded in the column
    space V of the isometry q (d × (k+1)).

    p_σ(x) = p_V(x_V) · N(x_⊥; 0, σ²I) with x_V = qᵀx, so
      ∇ log p_σ(x) = q · u · A_{p/2}(ρ/σ²)/σ² − x/σ²,
    p = k+1, ρ = ‖x_V‖, u = x_V/ρ, A_ν = I_ν/I_{ν-1} (d/dκ log(I_ν(κ)κ^{-ν})
    = I_{ν+1}/I_ν).  The in-V part reduces to the vMF radial formula with the
    CORRECT order p = k+1 (the reference uses p = k, ksphere_gt.py:25 — an
    off-by-half-order approximation).
    """
    p = q.shape[1]  # manifold_dim + 1
    sigma = jnp.asarray(sigma, dtype=x.dtype).reshape(-1, 1)
    x_v = x @ q  # (B, p)
    rho = jnp.linalg.norm(x_v, axis=-1, keepdims=True)
    kappa = rho / sigma**2
    a = bessel_iv_ratio(p / 2.0, kappa)
    in_v = (x_v / rho) * a / sigma**2
    return in_v @ q.T - x / sigma**2


@register_model(name="ksphere_gt_exact")
class KSphereExactGT(nn.Module):
    """Codimension-aware analytic oracle for the embedded k-sphere.

    Reconstructs the embedding isometry exactly as the datamodule does
    (iddiff/data/ksphere.py: fixed-seed QR for 'random_isometry', identity
    block for 'first') so the whole no-training ID / sampling pipeline has a
    true ground-truth score at every noise level.
    """

    config: object

    def setup(self):
        import numpy as np

        d = self.config.data
        k, amb = d.manifold_dim, d.ambient_dim
        emb = d.get("embedding_type", "random_isometry")
        if emb == "random_isometry":
            g = np.random.default_rng(0)
            m = g.normal(size=(amb, k + 1))
            q, _ = np.linalg.qr(m)
        elif emb == "first":
            q = np.eye(amb, k + 1)
        else:
            raise NotImplementedError(f"exact oracle: embedding '{emb}'")
        self.q = jnp.asarray(q, dtype=jnp.float32)

    @nn.compact
    def __call__(self, x, sigmas, *, train: bool = False):
        _ = self.param("dummy", nn.initializers.zeros, (1,))
        return ksphere_exact_score(x, sigmas, self.q)
