"""Cross-framework parity: probability-flow-ODE log-likelihood vs the
REFERENCE's scipy/torch implementation (likelihood.py:26-130).

Both sides use exact (non-stochastic) divergence, the same VESDE, and a
stub network chosen so the wrapped score is the ANALYTIC score of
N(0, I) diffused by the VESDE: score_t(x) = -x / (1 + sigma_t^2).  The
solvers differ (scipy RK45 vs iddiff's jitted Dormand-Prince), so values
agree to solver tolerance, and both must match the closed-form Gaussian
log-density.

Skipped when /root/reference or torch is absent.
"""
import math
import os
import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from _reference_stubs import REF, install_pl_stub  # noqa: E402
pytestmark = pytest.mark.skipif(
    not os.path.isfile(os.path.join(REF, "likelihood.py")),
    reason="reference repo not available",
)

# sigma_max large so the VESDE prior approximation error
# (N(0, smax^2) vs true N(0, 1+smax^2): d/2 * log(1+1/smax^2) nats,
# shared by BOTH frameworks) stays inside the closed-form tolerance
SMIN, SMAX, N = 0.01, 25.0, 1000


@pytest.fixture(scope="module")
def ref_likelihood():
    install_pl_stub(torch)
    sys.path.insert(0, REF)
    try:
        import likelihood as ref_likelihood_mod
        import sde_lib as ref_sde_lib
    finally:
        sys.path.remove(REF)
    return ref_likelihood_mod, ref_sde_lib


class _TorchGaussStub(torch.nn.Module):
    """model(x, labels) = sigma*x/(1+sigma^2) so that the VE adapter's
    -model/std equals the analytic N(0,I)-diffused score."""

    def forward(self, x, labels):
        t = labels / (N - 1)
        sigma = SMIN * (SMAX / SMIN) ** t
        return sigma[:, None] * x / (1.0 + sigma[:, None] ** 2)


def _flax_gauss_stub():
    import flax.linen as nn

    class FlaxGaussStub(nn.Module):
        @nn.compact
        def __call__(self, x, labels, train=False):
            _ = self.param("dummy", nn.initializers.zeros, (1,))
            t = labels / (N - 1)
            sigma = SMIN * (SMAX / SMIN) ** t
            return sigma[:, None] * x / (1.0 + sigma[:, None] ** 2)

    model = FlaxGaussStub()
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 3)), jnp.zeros((1,))
    )["params"]
    return model, params


def test_likelihood_parity_exact_divergence(ref_likelihood):
    ref_mod, ref_sde_lib = ref_likelihood
    from iddiff.likelihood import get_likelihood_fn
    from iddiff.sde import VESDE

    rng = np.random.default_rng(7)
    x = rng.normal(size=(4, 3)).astype(np.float32)

    ref_sde = ref_sde_lib.VESDE(sigma_min=SMIN, sigma_max=SMAX, N=N)
    ref_fn = ref_mod.get_likelihood_fn(
        ref_sde, inverse_scaler=None, exact=True, rtol=1e-5, atol=1e-5,
        eps=1e-5)
    want_bpd, want_z, want_nfe = ref_fn(_TorchGaussStub(), torch.from_numpy(x))
    want_bpd = want_bpd.detach().numpy()

    got_sde = VESDE(sigma_min=SMIN, sigma_max=SMAX, N=N)
    model, params = _flax_gauss_stub()
    got_fn = get_likelihood_fn(
        got_sde, model, rtol=1e-5, atol=1e-5, eps=1e-5,
        exact_divergence=True, bits_per_dim=False)
    got_bpd, got_z, got_nfe = got_fn(jax.random.PRNGKey(1), params,
                                     jnp.asarray(x))
    got_bpd = np.asarray(got_bpd)

    # (a) frameworks agree to solver tolerance
    np.testing.assert_allclose(got_bpd, want_bpd, rtol=2e-3, atol=2e-3)
    # (b) both match the closed form: the reference's "bpd" is the negative
    #     log-likelihood in nats (the /log(2)//N lines are commented out,
    #     likelihood.py:121-125); data density here is N(0, (1+sigma_min^2) I)
    var = 1.0 + SMIN**2
    d = x.shape[1]
    logp = (-d / 2.0 * math.log(2 * math.pi * var)
            - (x**2).sum(axis=1) / (2 * var))
    np.testing.assert_allclose(got_bpd, -logp, rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(want_bpd, -logp, rtol=5e-3, atol=5e-3)
