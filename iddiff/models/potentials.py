"""Energy-parameterized (potential) score models.

Rebuild of /root/reference/models/fcn_potential.py:6-160 and
models/ddpm_potential.py:81-238.  A potential model defines a scalar
log-energy E_θ(x, t); its score is ∇_x E_θ via autodiff — in JAX a one-line
jax.grad instead of the reference's autograd.grad gymnastics
(fcn_potential.py:43-51).  Extra heads used by the Fokker–Planck loss:
  - trace_hessian_log_energy: tr ∇²_x E (fcn_potential.py:53-65)
  - time_derivative_log_energy: ∂_t E (fcn_potential.py:86-94)
  - energy = exp(E) — consumed by the MALA corrector
    (sampling/unconditional.py:336-338 wiring).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .fcn import _MLP
from .registry import register_model


class _PotentialMixin:
    """Shared autodiff heads; subclasses implement log_energy(x, t, train)."""

    def __call__(self, x, t, *, train: bool = False):
        return self.score(x, t, train=train)

    def score(self, x, t, *, train: bool = False):
        f = lambda xi: jnp.sum(self.log_energy(xi, t, train=train))
        return jax.grad(f)(x)

    def energy(self, x, t, *, train: bool = False):
        return jnp.exp(self.log_energy(x, t, train=train))

    def trace_hessian_log_energy(self, x, t, *, train: bool = False):
        d = x.shape[-1]
        score_fn = lambda xi: self.score(xi, t, train=train)

        def diag_entry(e):
            _, jvp_e = jax.jvp(score_fn, (x,), (jnp.broadcast_to(e, x.shape),))
            return jnp.sum(jvp_e * e[None], axis=-1)

        return jax.vmap(diag_entry)(jnp.eye(d, dtype=x.dtype)).sum(axis=0)

    def time_derivative_log_energy(self, x, t, *, train: bool = False):
        g = lambda ti: jnp.sum(self.log_energy(x, ti, train=train))
        return jax.grad(g)(t)


@register_model(name="fcn_potential")
class FCNPotential(_PotentialMixin, nn.Module):
    """Scalar-output MLP potential (fcn_potential.py:6-98)."""

    config: object

    def setup(self):
        m = self.config.model
        self.net = _MLP(
            hidden_layers=m.hidden_layers,
            hidden_nodes=m.hidden_nodes,
            output_size=1,
            dropout=m.get("dropout", 0.0),
        )

    def log_energy(self, x, t, train: bool = False):
        t = jnp.asarray(t, dtype=x.dtype)
        if t.ndim == x.ndim - 1:
            t = t[..., None]
        h = jnp.concatenate(
            [x, jnp.broadcast_to(t, x.shape[:-1] + (1,))], axis=-1
        )
        return self.net(h, train=train)


@register_model(name="fcn_compound")
class FCNCompound(_PotentialMixin, nn.Module):
    """Two-net potential: Fokker–Planck net + corrector net, summed with
    weights (fcn_potential.py:101-160)."""

    config: object

    def setup(self):
        m = self.config.model
        kw = dict(
            hidden_layers=m.hidden_layers,
            hidden_nodes=m.hidden_nodes,
            output_size=1,
            dropout=m.get("dropout", 0.0),
        )
        self.net_fp = _MLP(**kw)
        self.net_corrector = _MLP(**kw)

    def log_energy(self, x, t, train: bool = False, weight_fp: float = 1.0,
                   weight_corrector: float = 1.0):
        t = jnp.asarray(t, dtype=x.dtype)
        if t.ndim == x.ndim - 1:
            t = t[..., None]
        h = jnp.concatenate(
            [x, jnp.broadcast_to(t, x.shape[:-1] + (1,))], axis=-1
        )
        return weight_fp * self.net_fp(h, train=train) + \
            weight_corrector * self.net_corrector(h, train=train)

    def score(self, x, t, *, train: bool = False, weight_fp: float = 1.0,
              weight_corrector: float = 1.0):
        f = lambda xi: jnp.sum(
            self.log_energy(xi, t, train=train, weight_fp=weight_fp,
                            weight_corrector=weight_corrector)
        )
        return jax.grad(f)(x)


@register_model(name="ddpm_potential")
class DDPMPotential(_PotentialMixin, nn.Module):
    """Image-shaped potential: DDPM U-Net trunk → flatten → Dense(1)
    (ddpm_potential.py:81-238)."""

    config: object

    def setup(self):
        from .ddpm_unet import DDPM

        self.trunk = DDPM(self.config)
        self.final = nn.Dense(1)

    def log_energy(self, x, t, train: bool = False):
        h = self.trunk(x, t, train=train)
        return self.final(h.reshape(h.shape[0], -1))

    def score(self, x, t, *, train: bool = False):
        f = lambda xi: jnp.sum(self.log_energy(xi, t, train=train))
        return jax.grad(f)(x)
