"""Cross-framework parity: curl (non-conservativity) penalty vs the
REFERENCE's literal implementation
(lightning_modules/ConservativeSdeGenerativeModel.py:38-67).

The reference computes (dv_y/dx - dv_x/dy) with two torch autograd passes
on the RAW score net and weights by g(t)^2; iddiff uses one vmapped jacfwd
(iddiff/losses/curl.py).  Both run on identical stub fields with a
non-zero curl and pinned (t, z).

The reference class is instantiated via __new__ (its __init__ drags in the
full Lightning/model-registry machinery); the method only touches
self.sde / self.score_model / self.curl_penalty_type.

Skipped when /root/reference or torch is absent.
"""
import os
import sys

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
        REF, "lightning_modules", "ConservativeSdeGenerativeModel.py")),
    reason="reference repo not available",
)


@pytest.fixture(scope="module")
def ref_curl():
    install_pl_stub(torch)
    install_torchvision_stub()
    sys.path.insert(0, REF)
    try:
        import sde_lib as ref_sde_lib
        from lightning_modules import (
            ConservativeSdeGenerativeModel as ref_mod,
        )
    finally:
        sys.path.remove(REF)

    # LATENT-BROKEN upstream: curl_penalty calls compute_grad(f, x, t) but
    # utils.compute_grad takes (f, x) (utils.py:103) — any invocation
    # raises TypeError.  Recover the intended semantics (gradient of
    # f(x, t) wrt x) so the literal curl formula can execute.
    def compute_grad_xt(f, x, t):
        with torch.enable_grad():
            x = x.requires_grad_(True)
            out = f(x, t)
            grads = torch.autograd.grad(
                outputs=out, inputs=x,
                grad_outputs=torch.ones(out.size()),
                create_graph=True, retain_graph=True, only_inputs=True)[0]
        return grads.view(grads.size(0), -1)

    ref_mod.compute_grad = compute_grad_xt
    return ref_mod.ConservativeSdeGenerativeModel, ref_sde_lib


class _TorchField(torch.nn.Module):
    """2-D field with non-zero curl: v = (w0·x0 + 0.3·x1², w1·x1 + 0.7·x0·x1 + 0.01·t)."""

    def __init__(self, w):
        super().__init__()
        self.w = torch.nn.Parameter(torch.from_numpy(w))

    def forward(self, x, t):
        v0 = self.w[0] * x[:, 0] + 0.3 * x[:, 1] ** 2
        v1 = self.w[1] * x[:, 1] + 0.7 * x[:, 0] * x[:, 1] + 0.01 * t
        return torch.stack([v0, v1], dim=1)


def _flax_field(w):
    import flax.linen as nn

    class FlaxField(nn.Module):
        @nn.compact
        def __call__(self, x, t, train=False):
            ww = self.param("w", lambda k: jnp.asarray(w))
            v0 = ww[0] * x[:, 0] + 0.3 * x[:, 1] ** 2
            v1 = ww[1] * x[:, 1] + 0.7 * x[:, 0] * x[:, 1] + 0.01 * t
            return jnp.stack([v0, v1], axis=1)

    model = FlaxField()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2)),
                        jnp.zeros((1,)))["params"]
    return model, params


@pytest.mark.parametrize("penalty_type", ["L2", "Linfty"])
def test_curl_penalty_parity(ref_curl, monkeypatch, penalty_type):
    ref_cls, ref_sde_lib = ref_curl
    from iddiff.losses.curl import get_curl_penalty_fn
    from iddiff.sde import VESDE

    rng_np = np.random.default_rng(30)
    w = rng_np.normal(size=(2,)).astype(np.float32)
    x = rng_np.normal(size=(6, 2)).astype(np.float32)
    u = rng_np.uniform(size=(6,)).astype(np.float32)
    z = rng_np.normal(size=(6, 2)).astype(np.float32)

    eps = 1e-5
    ref_sde = ref_sde_lib.VESDE(sigma_min=0.05, sigma_max=5.0, N=100)
    t_forced = (u * (ref_sde.T - eps) + eps).astype(np.float32)

    monkeypatch.setattr(torch, "rand", lambda *a, **k: torch.from_numpy(u))
    monkeypatch.setattr(
        torch, "randn_like", lambda b, **k: torch.from_numpy(z))

    ref_self = ref_cls.__new__(ref_cls)
    torch.nn.Module.__init__(ref_self)  # init _modules without Lightning
    ref_self.sde = ref_sde
    ref_self.score_model = _TorchField(w)
    ref_self.curl_penalty_type = penalty_type
    want = float(ref_cls.curl_penalty(ref_self, torch.from_numpy(x),
                                      eps=eps))

    monkeypatch.setattr(
        jax.random, "uniform",
        lambda key, shape, dtype=None, minval=0.0, maxval=1.0:
            jnp.asarray(t_forced))
    monkeypatch.setattr(
        jax.random, "normal",
        lambda key, shape, dtype=None: jnp.asarray(z))
    model, params = _flax_field(w)
    got_fn = get_curl_penalty_fn(
        VESDE(sigma_min=0.05, sigma_max=5.0, N=100), model,
        penalty_type=penalty_type, eps=eps, train=False)
    got = float(got_fn(params, jnp.asarray(x), jax.random.PRNGKey(0)))

    np.testing.assert_allclose(got, want, rtol=5e-4)
