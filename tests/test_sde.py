"""Unit tests of the SDE math core against closed forms (SURVEY.md §4a)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iddiff.sde import VESDE, VPSDE, SubVPSDE, SNRSDE, CVESDE


def test_vesde_sigma_closed_form():
    sde = VESDE(sigma_min=0.01, sigma_max=50.0, N=1000)
    t = jnp.array([0.0, 0.25, 0.5, 1.0])
    _, std = sde.marginal_prob(jnp.zeros((4, 3)), t)
    expected = 0.01 * (50.0 / 0.01) ** np.asarray(t)
    np.testing.assert_allclose(std, expected, rtol=1e-5)
    # mean is identity
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 3))
    mean, _ = sde.marginal_prob(x, t)
    np.testing.assert_allclose(mean, x)


def test_vesde_discrete_sigma_matches_geomspace():
    sde = VESDE(sigma_min=0.01, sigma_max=50.0, N=1000)
    ladder = np.exp(np.linspace(np.log(0.01), np.log(50.0), 1000))
    idx = jnp.array([0, 1, 500, 999])
    np.testing.assert_allclose(
        sde.discrete_sigma(idx), ladder[np.asarray(idx)], rtol=1e-5
    )


def test_vesde_diffusion_consistency():
    """g(t)² must equal d[σ²(t)]/dt for the VE SDE."""
    sde = VESDE(sigma_min=0.01, sigma_max=50.0)
    t = jnp.array([0.3, 0.7])
    _, g = sde.sde(jnp.zeros((2, 5)), t)
    sigma2 = lambda s: (0.01 * (50.0 / 0.01) ** s) ** 2
    dsigma2 = jax.vmap(jax.grad(sigma2))(t)
    np.testing.assert_allclose(g**2, dsigma2, rtol=1e-4)


def test_vpsde_marginal_closed_form():
    sde = VPSDE(beta_min=0.1, beta_max=20.0, N=1000)
    t = jnp.array([0.1, 0.5, 0.9])
    x = jnp.ones((3, 4))
    mean, std = sde.marginal_prob(x, t)
    lmc = -0.25 * np.asarray(t) ** 2 * (20.0 - 0.1) - 0.5 * np.asarray(t) * 0.1
    np.testing.assert_allclose(mean[:, 0], np.exp(lmc), rtol=1e-5)
    np.testing.assert_allclose(std, np.sqrt(1 - np.exp(2 * lmc)), rtol=1e-5)
    # variance preserving: mean² + std² = 1 for unit x
    np.testing.assert_allclose(mean[:, 0] ** 2 + std**2, 1.0, rtol=1e-5)


def test_vpsde_ddpm_discretize():
    sde = VPSDE(beta_min=0.1, beta_max=20.0, N=1000)
    t = jnp.array([0.5])
    x = jnp.ones((1, 2))
    f, G = sde.discretize(x, t)
    ts = int(0.5 * 999)
    beta = np.linspace(0.1 / 1000, 20.0 / 1000, 1000)[ts]
    np.testing.assert_allclose(G, np.sqrt(beta), rtol=1e-5)
    np.testing.assert_allclose(f, (np.sqrt(1 - beta) - 1) * np.ones((1, 2)), rtol=1e-4)


def test_subvpsde_matches_reference_convention():
    """The reference returns std WITHOUT sqrt for subVP (sde_lib.py:303)."""
    sde = SubVPSDE(beta_min=0.1, beta_max=20.0)
    t = jnp.array([0.5])
    _, std = sde.marginal_prob(jnp.zeros((1, 2)), t)
    lmc = -0.25 * 0.25 * 19.9 - 0.25 * 0.1
    np.testing.assert_allclose(std, 1 - np.exp(2 * lmc), rtol=1e-5)


def test_snrsde_endpoints():
    sde = SNRSDE()
    # -log SNR at t=0 is -10, at t=1 is 5 (sde_lib.py:162-166)
    np.testing.assert_allclose(-sde.log_SNR(jnp.array(0.0)), -10.0, atol=1e-4)
    np.testing.assert_allclose(-sde.log_SNR(jnp.array(1.0)), 5.0, atol=1e-4)


def test_perturb_statistics():
    sde = VESDE(sigma_min=0.01, sigma_max=50.0)
    x0 = jnp.zeros((20000, 2))
    t = jnp.full((20000,), 0.5)
    xt = sde.perturb(jax.random.PRNGKey(1), x0, t)
    emp_std = np.std(np.asarray(xt))
    np.testing.assert_allclose(emp_std, sde.sigma(0.5), rtol=0.02)


def test_prior_logp_standard_normal():
    sde = VPSDE()
    z = jnp.zeros((2, 3, 4, 1))
    d = 12
    np.testing.assert_allclose(
        sde.prior_logp(z), -d / 2 * np.log(2 * np.pi), rtol=1e-6
    )
    ve = VESDE(sigma_max=50.0)
    np.testing.assert_allclose(
        ve.prior_logp(jnp.zeros((1, 5))), -5 / 2 * np.log(2 * np.pi * 2500), rtol=1e-6
    )


def test_reverse_sde_drift():
    """Reverse drift = f - g² s (SDE) and f - ½ g² s (prob flow)."""
    sde = VESDE(sigma_min=0.01, sigma_max=50.0)
    score = lambda x, t: -x  # standard normal score
    x = jnp.ones((2, 3))
    t = jnp.full((2,), 0.5)
    f_fwd, g_fwd = sde.sde(x, t)
    r = sde.reverse(score, probability_flow=False)
    drift, diff = r.sde(x, t)
    np.testing.assert_allclose(drift, f_fwd - g_fwd[:, None] ** 2 * (-x), rtol=1e-5)
    np.testing.assert_allclose(diff, g_fwd)
    ro = sde.reverse(score, probability_flow=True)
    drift_o, diff_o = ro.sde(x, t)
    np.testing.assert_allclose(
        drift_o, f_fwd - 0.5 * g_fwd[:, None] ** 2 * (-x), rtol=1e-5
    )
    np.testing.assert_allclose(diff_o, 0.0)


def test_ve_backward_kernel_consistency():
    """p(x_t|x_0,x_{t+τ}) must have smaller variance than p(x_t|x_0)."""
    sde = VESDE(sigma_min=0.01, sigma_max=50.0)
    t = jnp.array([0.3])
    tau = jnp.array([0.1])
    x0 = jnp.zeros((1, 2))
    xt = jnp.ones((1, 2))
    mean_b, std_b = sde.compute_backward_kernel(x0, xt, t, tau)
    assert float(std_b[0]) < float(sde.sigma(t[0]))
    s_t2 = float(sde.sigma(t[0])) ** 2
    s_tt2 = float(sde.sigma(t[0] + tau[0])) ** 2
    np.testing.assert_allclose(mean_b, s_t2 / s_tt2 * np.ones((1, 2)), rtol=1e-5)


def test_cvesde_same_marginals_as_vesde():
    c = CVESDE(sigma_min=0.01, sigma_max=50.0)
    v = VESDE(sigma_min=0.01, sigma_max=50.0)
    t = jnp.array([0.2, 0.8])
    x = jnp.ones((2, 3))
    np.testing.assert_allclose(c.marginal_prob(x, t)[1], v.marginal_prob(x, t)[1])
