"""Model registry, FCN forward, oracle Bessel ratio, score_fn sign/scale."""
import jax
import jax.numpy as jnp
import ml_collections
import numpy as np
import pytest

from iddiff.models import create_model, get_score_fn, MODELS
from iddiff.models.ksphere_gt import bessel_iv_ratio, ksphere_score
from iddiff.sde import VESDE, VPSDE


def fcn_config(state_size=10, hidden_layers=2, hidden_nodes=64):
    config = ml_collections.ConfigDict()
    config.model = ml_collections.ConfigDict()
    config.model.name = "fcn"
    config.model.state_size = state_size
    config.model.hidden_layers = hidden_layers
    config.model.hidden_nodes = hidden_nodes
    config.model.dropout = 0.0
    return config


def test_registry_has_core_models():
    for name in ["fcn", "fcn_conditional", "fcn_joint", "ksphere_gt"]:
        assert name in MODELS


def test_fcn_forward_shape():
    config = fcn_config()
    model = create_model(config)
    x = jnp.ones((4, 10))
    t = jnp.full((4,), 500.0)
    params = model.init(jax.random.PRNGKey(0), x, t)["params"]
    out = model.apply({"params": params}, x, t)
    assert out.shape == (4, 10)


def test_bessel_iv_ratio_vs_scipy():
    from scipy.special import ive

    nus = np.array([0.5, 1.0, 5.0, 25.0])
    xs = np.array([1e-3, 0.1, 1.0, 10.0, 100.0, 1e4])
    for nu in nus:
        got = np.asarray(bessel_iv_ratio(nu, jnp.asarray(xs)))
        want = ive(nu, xs) / ive(nu - 1, xs)
        np.testing.assert_allclose(got, want, rtol=2e-4, err_msg=f"nu={nu}")


def test_ksphere_score_matches_reference_numpy():
    """Replicate /root/reference/models/ksphere_gt.py:14-27 in numpy."""
    from scipy.special import ive

    rng = np.random.default_rng(0)
    p = 10
    x = rng.normal(size=(8, 100)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    sigma = np.full((8,), 0.05, dtype=np.float32)

    def ref_score(batch, sigmas):
        out = []
        for xi, s in zip(batch, sigmas):
            r = np.linalg.norm(xi)
            a = -(-ive(p / 2, r / s**2) / ive(p / 2 - 1, r / s**2))
            out.append((xi / r) * (a - r) / s**2)
        return np.stack(out)

    got = np.asarray(ksphere_score(jnp.asarray(x), jnp.asarray(sigma), p))
    want = ref_score(x, sigma)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-3)


def test_score_fn_ve_sign_and_scale():
    """Unconditional VE: score = -model(x, t·(N-1)) / σ(t)."""
    config = fcn_config(state_size=4)
    model = create_model(config)
    sde = VESDE(sigma_min=0.01, sigma_max=50.0, N=1000)
    x = jnp.ones((3, 4))
    t = jnp.full((3,), 0.5)
    params = model.init(jax.random.PRNGKey(0), x, t)["params"]
    score_fn = get_score_fn(sde, model, params)
    raw = model.apply({"params": params}, x, t * 999)
    std = sde.sigma(0.5)
    np.testing.assert_allclose(score_fn(x, t), -raw / std, rtol=1e-5)


def test_score_fn_vp_sign_and_scale():
    config = fcn_config(state_size=4)
    model = create_model(config)
    sde = VPSDE(N=1000)
    x = jnp.ones((3, 4))
    t = jnp.full((3,), 0.5)
    params = model.init(jax.random.PRNGKey(0), x, t)["params"]
    score_fn = get_score_fn(sde, model, params)
    raw = model.apply({"params": params}, x, t * 999)
    _, std = sde.marginal_prob(jnp.zeros((3,)), t)
    np.testing.assert_allclose(score_fn(x, t), -raw / std[:, None], rtol=1e-5)


def test_oracle_score_fn_via_adapter():
    """KSphereGT short-circuits the adapter (models/utils.py:169-175)."""
    config = ml_collections.ConfigDict()
    config.model = ml_collections.ConfigDict({"name": "ksphere_gt"})
    config.data = ml_collections.ConfigDict({"manifold_dim": 10})
    model = create_model(config)
    sde = VESDE(sigma_min=0.01, sigma_max=4.0, N=1000)
    x = jax.random.normal(jax.random.PRNGKey(0), (5, 100))
    x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
    t = jnp.full((5,), 1e-5)
    params = model.init(jax.random.PRNGKey(0), x, jnp.ones((5,)))["params"]
    score_fn = get_score_fn(sde, model, params)
    score = score_fn(x, t)
    assert score.shape == (5, 100)
    # at tiny sigma the score pushes points onto the sphere: near-tangentially
    # zero radial magnitude for points already on it => finite, no NaN
    assert np.all(np.isfinite(np.asarray(score)))
