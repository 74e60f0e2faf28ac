"""Potential models, Fokker-Planck/curl training flavors, likelihood ODE."""
import jax
import jax.numpy as jnp
import ml_collections
import numpy as np
import pytest

from iddiff.likelihood import get_likelihood_fn
from iddiff.models import create_model, MODELS
from iddiff.sde import VESDE, VPSDE


def pot_config(name="fcn_potential", state_size=2):
    c = ml_collections.ConfigDict()
    c.model = ml_collections.ConfigDict(dict(
        name=name, state_size=state_size, hidden_layers=1, hidden_nodes=32,
        dropout=0.0,
    ))
    return c


def test_potential_registry():
    for name in ["fcn_potential", "fcn_compound", "ddpm_potential"]:
        assert name in MODELS


def test_fcn_potential_score_is_gradient():
    """score must equal ∇_x log_energy (finite differences)."""
    config = pot_config()
    model = create_model(config)
    x = jnp.asarray([[0.3, -0.2], [1.0, 0.5]])
    t = jnp.asarray([0.1, 0.9])
    params = model.init(jax.random.PRNGKey(0), x, t)["params"]
    score = model.apply({"params": params}, x, t)
    assert score.shape == (2, 2)
    eps = 1e-3
    for i in range(2):
        xp = x.at[0, i].add(eps)
        xm = x.at[0, i].add(-eps)
        ep = model.apply({"params": params}, xp, t, method=model.log_energy)
        em = model.apply({"params": params}, xm, t, method=model.log_energy)
        num = (float(ep[0, 0]) - float(em[0, 0])) / (2 * eps)
        np.testing.assert_allclose(float(score[0, i]), num, rtol=1e-2, atol=1e-4)


def test_potential_heads():
    config = pot_config()
    model = create_model(config)
    x = jnp.ones((3, 2))
    t = jnp.full((3,), 0.5)
    params = model.init(jax.random.PRNGKey(0), x, t)["params"]
    e = model.apply({"params": params}, x, t, method=model.energy)
    assert e.shape == (3, 1) and np.all(np.asarray(e) > 0)
    tr = model.apply({"params": params}, x, t,
                     method=model.trace_hessian_log_energy)
    assert tr.shape == (3,)
    dt = model.apply({"params": params}, x, t,
                     method=model.time_derivative_log_energy)
    assert dt.shape == (3,)


def test_fcn_compound_weights():
    config = pot_config("fcn_compound")
    model = create_model(config)
    x = jnp.ones((2, 2))
    t = jnp.full((2,), 0.5)
    params = model.init(jax.random.PRNGKey(0), x, t)["params"]
    full = model.apply({"params": params}, x, t, method=model.log_energy)
    fp_only = model.apply({"params": params}, x, t, method=model.log_energy,
                          weight_corrector=0.0)
    corr_only = model.apply({"params": params}, x, t, method=model.log_energy,
                            weight_fp=0.0)
    np.testing.assert_allclose(
        np.asarray(full), np.asarray(fp_only + corr_only), rtol=1e-5
    )


def test_fp_loss_runs_and_grads():
    from iddiff.losses.fokker_planck import get_fp_loss_fn

    config = pot_config()
    model = create_model(config)
    sde = VESDE(sigma_min=0.01, sigma_max=2.0, N=100)
    x = jax.random.normal(jax.random.PRNGKey(0), (16, 2))
    params = model.init(jax.random.PRNGKey(1), x, jnp.zeros((16,)))["params"]
    for hutch in [True, False]:
        fp = get_fp_loss_fn(sde, model, hutchinson=hutch)
        loss, grads = jax.value_and_grad(fp)(params, x, jax.random.PRNGKey(2))
        assert np.isfinite(float(loss))
        import optax

        assert float(optax.global_norm(grads)) > 0


def test_fp_weight_schedules():
    from iddiff.losses.fokker_planck import fp_weight_schedule

    c = ml_collections.ConfigDict()
    c.training = ml_collections.ConfigDict(dict(
        schedule="geometric", num_epochs=100, alpha=0.5,
        alpha_min=0.01, alpha_max=1.0,
    ))
    w0 = fp_weight_schedule(c, 0)
    w100 = fp_weight_schedule(c, 100)
    np.testing.assert_allclose(w0, 0.01, rtol=1e-6)
    np.testing.assert_allclose(w100, 1.0, rtol=1e-6)
    c.training.schedule = "linear"
    np.testing.assert_allclose(fp_weight_schedule(c, 50), 0.505, rtol=1e-6)
    c.training.schedule = "constant"
    np.testing.assert_allclose(fp_weight_schedule(c, 7), 0.5)


def test_curl_penalty_zero_for_conservative_field():
    """A potential model's score is a gradient field ⇒ curl ≈ 0; the fcn
    MLP's raw output is generically non-conservative ⇒ curl > 0."""
    from iddiff.losses.curl import get_curl_penalty_fn

    sde = VESDE(sigma_min=0.01, sigma_max=2.0, N=100)
    x = jax.random.normal(jax.random.PRNGKey(0), (32, 2))

    pot = create_model(pot_config())
    p_params = pot.init(jax.random.PRNGKey(1), x, jnp.zeros((32,)))["params"]
    curl_pot = get_curl_penalty_fn(sde, pot)(p_params, x, jax.random.PRNGKey(2))
    assert float(curl_pot) < 1e-8

    from tests.test_models import fcn_config

    mlp = create_model(fcn_config(state_size=2, hidden_layers=1, hidden_nodes=32))
    m_params = mlp.init(jax.random.PRNGKey(3), x, jnp.zeros((32,)))["params"]
    curl_mlp = get_curl_penalty_fn(sde, mlp)(m_params, x, jax.random.PRNGKey(4))
    assert float(curl_mlp) > float(curl_pot)


def test_likelihood_standard_normal_vp():
    """bits/dim of N(0,I) data under an exact N(0,I) score ≈ the true value.

    For VPSDE with score(x,t) = -x (the stationary standard normal), the
    probability-flow ODE is an identity in distribution, so
    bpd ≈ -log2 N(x;0,I)/d per sample ⇒ E[bpd] = (d/2 log(2πe))/d/log2.
    """
    sde = VPSDE(N=100)

    class _M:
        pass

    # bypass the model registry: make get_score_fn irrelevant by building the
    # likelihood fn with a shim model whose apply returns -x * std (so that
    # -out/std = -x ... ). Simpler: use a potential-free direct path.
    import iddiff.likelihood.likelihood as L

    def fake_get_score_fn(sde_, model_, params_, train=False, continuous=True):
        return lambda x, t: -x

    orig = L.get_score_fn
    L.get_score_fn = fake_get_score_fn
    try:
        fn = L.get_likelihood_fn(sde, model=None, eps=1e-5, rtol=1e-5, atol=1e-5)
        data = jax.random.normal(jax.random.PRNGKey(0), (64, 4))
        bpd, z, nfev = fn(jax.random.PRNGKey(1), None, data)
    finally:
        L.get_score_fn = orig
    d = 4
    expected = 0.5 * np.log2(2 * np.pi * np.e)  # per dim
    got = float(jnp.mean(bpd))
    np.testing.assert_allclose(got, expected, rtol=0.05)
    assert int(nfev) > 0


def test_trainer_fokker_planck_flavor(tmp_path):
    """2 epochs of the fokker-planck module on GaussianBubbles."""
    from iddiff.training import Trainer
    from tests.test_training import tiny_bubbles_config

    config = tiny_bubbles_config()
    config.model.name = "fcn_potential"
    config.training.lightning_module = "fokker-planck"
    config.training.schedule = "constant"
    config.training.alpha = 0.1
    config.training.hutchinson = True
    config.training.visualization_callback = None
    trainer = Trainer(config, workdir=str(tmp_path / "fp"))
    state = trainer.fit()
    assert int(state.step) > 0


def test_trainer_curl_penalty_flavor(tmp_path):
    from iddiff.training import Trainer
    from tests.test_training import tiny_bubbles_config

    config = tiny_bubbles_config()
    config.training.lightning_module = "curl_penalty"
    config.training.LAMBDA = 0.1
    config.training.adaptive = False
    config.model.curl_penalty_type = "L2"
    config.training.visualization_callback = None
    trainer = Trainer(config, workdir=str(tmp_path / "curl"))
    state = trainer.fit()
    assert int(state.step) > 0


def test_mala_corrector_with_potential_model():
    """MALA sampling with the energy head wired (PC sampler path)."""
    from iddiff.sampling import get_pc_sampler

    config = pot_config()
    model = create_model(config)
    sde = VESDE(sigma_min=0.01, sigma_max=2.0, N=20)
    x = jnp.ones((4, 2))
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((4,)))["params"]
    sampler = get_pc_sampler(
        sde, model, (8, 2), predictor="reverse_diffusion", corrector="mala",
        n_steps_each=1, snr=0.1, eps=1e-3,
    )
    out = sampler(jax.random.PRNGKey(1), params)
    assert out.shape == (8, 2)
    assert np.all(np.isfinite(np.asarray(out)))
