"""Cross-framework parity: iddiff SDE math vs the REFERENCE's sde_lib.

/root/reference/sde_lib.py is pure torch+numpy and imports cleanly on
CPU, so every SDE family is compared point-for-point on identical
(x, t): drift/diffusion, marginal_prob, prior_logp, and discretize.
This is the L3 analogue of tests/test_reference_parity.py (L0 kernels).

Skipped when /root/reference or torch is absent.
"""
import os
import sys

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isfile(os.path.join(REF, "sde_lib.py")),
    reason="reference repo not available",
)


@pytest.fixture(scope="module")
def ref_sde_lib():
    sys.path.insert(0, REF)
    try:
        import sde_lib
    finally:
        sys.path.remove(REF)
    return sde_lib


def _xt(seed=0, n=7, d=5):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, d)).astype(np.float32)
    t = rng.uniform(1e-3, 1.0, size=(n,)).astype(np.float32)
    return x, t


def _pair(fn_ref, fn_jax, x, t, rtol=1e-4, atol=1e-5):
    rx, rt = torch.from_numpy(x), torch.from_numpy(t)
    want = fn_ref(rx, rt)
    got = fn_jax(jnp.asarray(x), jnp.asarray(t))
    want = [w.numpy() if torch.is_tensor(w) else np.asarray(w)
            for w in (want if isinstance(want, tuple) else (want,))]
    got = [np.asarray(g)
           for g in (got if isinstance(got, tuple) else (got,))]
    assert len(want) == len(got)
    for w, g in zip(want, got):
        np.testing.assert_allclose(
            g.reshape(w.shape), w, rtol=rtol, atol=atol)


def test_vesde_parity(ref_sde_lib):
    from iddiff.sde import VESDE

    ref = ref_sde_lib.VESDE(sigma_min=0.02, sigma_max=30.0, N=500)
    got = VESDE(sigma_min=0.02, sigma_max=30.0, N=500)
    x, t = _xt(1)
    _pair(ref.sde, got.sde, x, t)
    _pair(ref.marginal_prob, got.marginal_prob, x, t)
    _pair(ref.discretize, got.discretize, x, t)
    z = x
    np.testing.assert_allclose(
        np.asarray(got.prior_logp(jnp.asarray(z))),
        ref.prior_logp(torch.from_numpy(z)).numpy(), rtol=1e-4)


def test_vpsde_parity(ref_sde_lib):
    from iddiff.sde import VPSDE

    ref = ref_sde_lib.VPSDE(beta_min=0.2, beta_max=15.0, N=500)
    got = VPSDE(beta_min=0.2, beta_max=15.0, N=500)
    x, t = _xt(2)
    _pair(ref.sde, got.sde, x, t)
    _pair(ref.marginal_prob, got.marginal_prob, x, t)
    _pair(ref.discretize, got.discretize, x, t)
    # the reference's VPSDE.prior_logp hardcodes dim=(1,2,3) → needs 4-D z
    z4 = np.random.default_rng(2).normal(size=(3, 2, 4, 4)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(got.prior_logp(jnp.asarray(z4))),
        ref.prior_logp(torch.from_numpy(z4)).numpy(), rtol=1e-4)


def test_subvpsde_parity(ref_sde_lib):
    from iddiff.sde import SubVPSDE

    ref = ref_sde_lib.subVPSDE(beta_min=0.1, beta_max=20.0, N=500)
    got = SubVPSDE(beta_min=0.1, beta_max=20.0, N=500)
    x, t = _xt(3)
    _pair(ref.sde, got.sde, x, t)
    _pair(ref.marginal_prob, got.marginal_prob, x, t)


def test_snrsde_parity(ref_sde_lib):
    from iddiff.sde import SNRSDE

    ref = ref_sde_lib.SNRSDE(N=500)
    got = SNRSDE(N=500)
    x, t = _xt(4)
    _pair(ref.sde, got.sde, x, t, rtol=5e-4, atol=1e-4)
    _pair(ref.marginal_prob, got.marginal_prob, x, t, rtol=5e-4, atol=1e-4)


def test_cvesde_parity(ref_sde_lib):
    from iddiff.sde import CVESDE

    ref = ref_sde_lib.cVESDE(sigma_min=0.02, sigma_max=10.0, N=500)
    got = CVESDE(sigma_min=0.02, sigma_max=10.0, N=500)
    x, t = _xt(5)
    _pair(ref.sde, got.sde, x, t)
    _pair(ref.marginal_prob, got.marginal_prob, x, t)
    # SMLD discretize lives on cVESDE in the reference (sde_lib.py:437-445);
    # the unconditional VESDE's copy is commented out (sde_lib.py:381-389).
    _pair(ref.discretize, got.discretize, x, t, rtol=5e-4, atol=1e-5)


def test_vesde_backward_kernel_parity(ref_sde_lib):
    """compute_backward_kernel (the SMLD posterior used by DDPM-style
    training, sde_lib.py VESDE)."""
    from iddiff.sde import VESDE

    ref = ref_sde_lib.VESDE(sigma_min=0.02, sigma_max=30.0, N=500)
    if not hasattr(ref, "compute_backward_kernel"):
        pytest.skip("reference VESDE lacks compute_backward_kernel")
    got = VESDE(sigma_min=0.02, sigma_max=30.0, N=500)
    rng = np.random.default_rng(6)
    x0 = rng.normal(size=(4, 5)).astype(np.float32)
    xt = rng.normal(size=(4, 5)).astype(np.float32)
    t = rng.uniform(1e-2, 0.8, size=(4,)).astype(np.float32)
    tau = np.float32(0.1)
    w_mean, w_std = ref.compute_backward_kernel(
        torch.from_numpy(x0), torch.from_numpy(xt),
        torch.from_numpy(t), float(tau))
    g_mean, g_std = got.compute_backward_kernel(
        jnp.asarray(x0), jnp.asarray(xt), jnp.asarray(t), float(tau))
    np.testing.assert_allclose(
        np.asarray(g_mean).reshape(w_mean.shape), w_mean.numpy(),
        rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(g_std).reshape(w_std.shape), w_std.numpy(),
        rtol=1e-4, atol=1e-5)
