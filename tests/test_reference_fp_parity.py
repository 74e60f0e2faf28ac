"""Cross-framework parity: Fokker–Planck residual loss vs the REFERENCE's
literal implementation (lightning_modules/FokkerPlanckModel.py:62-112).

Both sides evaluate the FP residual |∂_t E − ½g²(‖∇E‖² + div ∇E)|·g² on the
same analytic quadratic potential E(x,t) = −(1+t)·a·‖x‖² + b·Σx (score,
divergence, and time derivative all closed-form), with pinned (t, z).
The reference side runs the literal compute_fp_loss via __new__ (its
__init__ needs the full Lightning stack); exact divergence on both sides.

Skipped when /root/reference or torch is absent.
"""
import os
import sys
import types

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from _reference_stubs import (  # noqa: E402
    REF,
    install_pl_stub,
    install_torchvision_stub,
)

pytestmark = pytest.mark.skipif(
    not os.path.isfile(os.path.join(
        REF, "lightning_modules", "FokkerPlanckModel.py")),
    reason="reference repo not available",
)

A, B_ = 0.35, 0.2


@pytest.fixture(scope="module")
def ref_fp():
    install_pl_stub(torch)
    install_torchvision_stub()
    sys.path.insert(0, REF)
    try:
        import sde_lib as ref_sde_lib
        from lightning_modules import FokkerPlanckModel as ref_mod
    finally:
        sys.path.remove(REF)
    return ref_mod.FokkerPlanckModel, ref_sde_lib


class _TorchPotential(torch.nn.Module):
    """E(x,t) = −(1+t)·a·‖x‖² + b·Σx."""

    def log_energy(self, x, t):
        return -(1 + t) * A * (x**2).sum(dim=1) + B_ * x.sum(dim=1)

    def score(self, x, t):
        return -(1 + t)[:, None] * 2 * A * x + B_


def _flax_potential(d):
    import flax.linen as nn

    class FlaxPotential(nn.Module):
        def setup(self):
            # a dummy param so init() yields a non-empty 'params' collection
            self.dummy = self.param("dummy", nn.initializers.zeros, (1,))

        def __call__(self, x, t, train=False):
            return self.log_energy(x, t)

        def log_energy(self, x, t, train=False):
            return -(1 + t) * A * (x**2).sum(axis=1) + B_ * x.sum(axis=1)

        def score(self, x, t, *, train=False):
            return -(1 + t)[:, None] * 2 * A * x + B_

        def trace_hessian_log_energy(self, x, t, train=False):
            return -(1 + t) * 2 * A * x.shape[1]

    model = FlaxPotential()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, d)),
                        jnp.zeros((1,)))["params"]
    return model, params


def test_fp_loss_parity(ref_fp, monkeypatch):
    ref_cls, ref_sde_lib = ref_fp
    from iddiff.losses.fokker_planck import get_fp_loss_fn
    from iddiff.sde import VESDE

    B, d = 6, 4
    rng_np = np.random.default_rng(31)
    x = rng_np.normal(size=(B, d)).astype(np.float32)
    u = rng_np.uniform(size=(B,)).astype(np.float32)
    z = rng_np.normal(size=(B, d)).astype(np.float32)

    eps = 1e-5
    ref_sde = ref_sde_lib.VESDE(sigma_min=0.05, sigma_max=5.0, N=100)
    t_forced = (u * (ref_sde.T - eps) + eps).astype(np.float32)

    monkeypatch.setattr(torch, "rand", lambda *a, **k: torch.from_numpy(u))
    monkeypatch.setattr(
        torch, "randn_like", lambda b, **k: torch.from_numpy(z))

    ref_self = ref_cls.__new__(ref_cls)
    torch.nn.Module.__init__(ref_self)
    ref_self.sde = ref_sde
    ref_self.score_model = _TorchPotential()
    ref_self.config = types.SimpleNamespace(
        training=types.SimpleNamespace(hutchinson=False))
    want = float(ref_cls.compute_fp_loss(ref_self, torch.from_numpy(x)))

    monkeypatch.setattr(
        jax.random, "uniform",
        lambda key, shape, dtype=None, minval=0.0, maxval=1.0:
            jnp.asarray(t_forced))
    monkeypatch.setattr(
        jax.random, "normal",
        lambda key, shape, dtype=None: jnp.asarray(z))
    model, params = _flax_potential(d)
    got_fn = get_fp_loss_fn(
        VESDE(sigma_min=0.05, sigma_max=5.0, N=100), model,
        hutchinson=False, eps=eps, train=False)
    got = float(got_fn(params, jnp.asarray(x), jax.random.PRNGKey(0)))

    np.testing.assert_allclose(got, want, rtol=5e-4)
