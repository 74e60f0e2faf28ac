"""Sampler tests against analytic scores (Gaussian + k-sphere oracle)."""
import jax
import jax.numpy as jnp
import ml_collections
import numpy as np
import pytest

from iddiff.models import create_model
from iddiff.sampling import (
    get_pc_sampler,
    get_ode_sampler,
    get_pc_inpainter,
    get_sampling_fn,
    PREDICTORS,
    CORRECTORS,
)
from iddiff.sampling.integrators import odeint_rk45
from iddiff.sde import VESDE, VPSDE


class AnalyticGaussianScore:
    """Fake 'model' whose score targets N(0, I): p_t = N(0, (1+σ_t²)I) for VE."""


def gaussian_score_sampler_inputs(sde):
    def score_fn(x, t):
        if isinstance(sde, VESDE):
            var = 1.0 + sde.sigma(t) ** 2
            return -x / var[:, None]
        # VP: p_t = N(0, I) is stationary-ish for unit data; use exact:
        # x_t = a x_0 + s z with a²+s²=1 ⇒ p_t = N(0, I)
        return -x

    return score_fn


def _patched_sampler(sde, score_fn, shape, **kw):
    """Bypass model/params plumbing: sample with a raw analytic score."""
    import iddiff.sampling.pc as pc

    class _FakeModel:
        pass

    # emulate get_pc_sampler but with the given score_fn
    from iddiff.sampling.predictors import get_predictor
    from iddiff.sampling.correctors import get_corrector

    p_step = get_predictor(kw.get("predictor", "reverse_diffusion"))(
        sde, score_fn, kw.get("probability_flow", False)
    )
    c_step = get_corrector(kw.get("corrector", "none"))(
        sde, score_fn, kw.get("snr", 0.15), kw.get("n_steps_each", 1)
    )
    timesteps = jnp.linspace(sde.T, kw.get("eps", 1e-3), sde.N)

    @jax.jit
    def sampler(rng):
        rng, kp = jax.random.split(rng)
        x = sde.prior_sampling(kp, shape)

        def body(carry, t):
            rng, x = carry
            rng, kc, kpp = jax.random.split(rng, 3)
            vec_t = jnp.full((shape[0],), t)
            x, xm = c_step(kc, x, vec_t)
            x, xm = p_step(kpp, x, vec_t)
            return (rng, x), xm

        (rng, x), xms = jax.lax.scan(body, (rng, x), timesteps)
        return xms[-1] if kw.get("denoise", True) else x

    return sampler


def test_registries():
    for p in ["euler_maruyama", "reverse_diffusion", "heun", "ancestral_sampling",
              "none", "conditional_euler_maruyama", "conditional_reverse_diffusion",
              "conditional_ancestral_sampling", "conditional_none"]:
        assert p in PREDICTORS
    for c in ["langevin", "ald", "mala", "none", "conditional_langevin",
              "conditional_none"]:
        assert c in CORRECTORS


@pytest.mark.parametrize("predictor", ["reverse_diffusion", "euler_maruyama",
                                       "ancestral_sampling"])
def test_pc_sampler_gaussian_ve(predictor):
    """Sampling N(0,I) through VESDE must recover unit variance."""
    sde = VESDE(sigma_min=0.01, sigma_max=10.0, N=300)
    score_fn = gaussian_score_sampler_inputs(sde)
    sampler = _patched_sampler(sde, score_fn, (4000, 2), predictor=predictor)
    x = np.asarray(sampler(jax.random.PRNGKey(0)))
    assert abs(x.mean()) < 0.1
    np.testing.assert_allclose(x.std(), 1.0, atol=0.12)


def test_pc_sampler_gaussian_vp():
    sde = VPSDE(N=300)
    score_fn = gaussian_score_sampler_inputs(sde)
    sampler = _patched_sampler(sde, score_fn, (4000, 2),
                               predictor="ancestral_sampling")
    x = np.asarray(sampler(jax.random.PRNGKey(1)))
    np.testing.assert_allclose(x.std(), 1.0, atol=0.12)


def test_langevin_corrector_improves():
    """Corrector-only sampling from a far init should move toward N(0,I)."""
    sde = VESDE(sigma_min=0.01, sigma_max=10.0, N=100)
    score_fn = gaussian_score_sampler_inputs(sde)
    sampler = _patched_sampler(sde, score_fn, (2000, 2), predictor="none",
                               corrector="langevin", n_steps_each=3, snr=0.3)
    x = np.asarray(sampler(jax.random.PRNGKey(2)))
    assert x.std() < 2.0  # prior std is 10; Langevin must contract


def test_heun_probability_flow():
    sde = VESDE(sigma_min=0.01, sigma_max=10.0, N=300)
    score_fn = gaussian_score_sampler_inputs(sde)
    sampler = _patched_sampler(sde, score_fn, (3000, 2), predictor="heun",
                               probability_flow=True, denoise=False)
    x = np.asarray(sampler(jax.random.PRNGKey(3)))
    np.testing.assert_allclose(x.std(), 1.0, atol=0.15)


def test_odeint_rk45_exponential():
    """dy/dt = -y from 1 to 0: y(0) = y0 * e^{1}."""
    f = lambda t, y: -y
    y0 = jnp.ones((4,))
    res = odeint_rk45(f, y0, 1.0, 0.0, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(res.y, np.e, rtol=1e-4)
    assert int(res.nfev) > 0


def test_ode_sampler_with_oracle_model():
    """Full ODE sampler via the public API with the k-sphere GT oracle:
    samples should land near the unit sphere (KSphereEvaluation analogue,
    lightning_callbacks/callbacks.py:434-452)."""
    config = ml_collections.ConfigDict()
    config.model = ml_collections.ConfigDict({"name": "ksphere_gt"})
    config.data = ml_collections.ConfigDict({"manifold_dim": 5})
    model = create_model(config)
    sde = VESDE(sigma_min=0.01, sigma_max=4.0, N=100)
    x_init = jnp.ones((2, 20))
    params = model.init(jax.random.PRNGKey(0), x_init, jnp.ones((2,)))["params"]

    sampler = get_ode_sampler(sde, model, (200, 20), denoise=False,
                              rtol=1e-4, atol=1e-4, eps=1e-3)
    x, nfev = sampler(jax.random.PRNGKey(4), params)
    norms = np.linalg.norm(np.asarray(x), axis=1)
    np.testing.assert_allclose(norms.mean(), 1.0, atol=0.1)


def test_pc_sampler_public_api_oracle():
    """get_pc_sampler(model, params): k-sphere oracle → ‖x‖ ≈ 1."""
    config = ml_collections.ConfigDict()
    config.model = ml_collections.ConfigDict({"name": "ksphere_gt"})
    config.data = ml_collections.ConfigDict({"manifold_dim": 5})
    model = create_model(config)
    sde = VESDE(sigma_min=0.01, sigma_max=4.0, N=200)
    params = model.init(jax.random.PRNGKey(0), jnp.ones((2, 20)), jnp.ones((2,)))[
        "params"
    ]
    sampler = get_pc_sampler(sde, model, (300, 20),
                             predictor="reverse_diffusion", corrector="none",
                             eps=1e-5)
    x = sampler(jax.random.PRNGKey(5), params)
    norms = np.linalg.norm(np.asarray(x), axis=1)
    np.testing.assert_allclose(norms.mean(), 1.0, atol=0.05)
    assert norms.std() < 0.1


def test_inpainter_keeps_known_region():
    config = ml_collections.ConfigDict()
    config.model = ml_collections.ConfigDict({"name": "ksphere_gt"})
    config.data = ml_collections.ConfigDict({"manifold_dim": 5})
    model = create_model(config)
    sde = VESDE(sigma_min=0.01, sigma_max=4.0, N=100)
    params = model.init(jax.random.PRNGKey(0), jnp.ones((2, 20)), jnp.ones((2,)))[
        "params"
    ]
    inpainter = get_pc_inpainter(sde, model, predictor="reverse_diffusion",
                                 corrector="none", eps=1e-5)
    data = jnp.ones((4, 20)) / jnp.sqrt(20.0)
    mask = jnp.zeros((4, 20)).at[:, :10].set(1.0)
    out = inpainter(jax.random.PRNGKey(6), params, data, mask)
    np.testing.assert_allclose(np.asarray(out)[:, :10], np.asarray(data)[:, :10],
                               atol=1e-5)


def test_factory_dispatch():
    config = ml_collections.ConfigDict()
    config.model = ml_collections.ConfigDict({"name": "ksphere_gt"})
    config.data = ml_collections.ConfigDict({"manifold_dim": 5})
    config.sampling = ml_collections.ConfigDict(dict(
        method="pc", predictor="reverse_diffusion", corrector="none",
        n_steps_each=1, noise_removal=True, probability_flow=False, snr=0.15,
    ))
    config.training = ml_collections.ConfigDict(dict(continuous=True,
                                                     show_evolution=False))
    model = create_model(config)
    sde = VESDE(sigma_min=0.01, sigma_max=4.0, N=50)
    params = model.init(jax.random.PRNGKey(0), jnp.ones((2, 10)), jnp.ones((2,)))[
        "params"
    ]
    fn = get_sampling_fn(config, sde, model, (8, 10), eps=1e-5)
    x = fn(jax.random.PRNGKey(7), params)
    assert x.shape == (8, 10)


class _AnalyticGaussianScore:
    """score of N(0, a² I) diffused under VESDE: s(x,t) = -x/(a²+σ(t)²)."""


def test_dpm_solver_gaussian_ve():
    """DPM-Solver++(2M) with the analytic VE Gaussian score recovers the
    target distribution in 20 evals (PC needs sde.N=1000)."""
    import ml_collections

    from iddiff.sampling.dpm import get_dpm_solver_sampler
    from iddiff.sde import VESDE

    a = 0.7
    d = 16
    sde = VESDE(sigma_min=1e-3, sigma_max=20.0, N=1000)

    class GaussModel:
        config = None

        def init(self, *args, **kw):
            return {"params": {}}

        def apply(self, variables, x, labels, train=False, **kw):
            # the net receives labels = t·(N-1); VE convention is
            # score = -model/σ (score_fn.py:166-173) => model = -σ·score
            t = labels / (sde.N - 1)
            sigma = sde.marginal_prob(jnp.zeros_like(t), t)[1]
            score = -x / (a**2 + sigma[:, None] ** 2)
            return -score * sigma[:, None]

    sampler = get_dpm_solver_sampler(
        sde, GaussModel(), (4096, d), steps=20, eps=1e-3
    )
    x = np.asarray(sampler(jax.random.PRNGKey(0), {}))
    assert x.shape == (4096, d)
    # target: N(0, (a² + eps-level σ²) I) ≈ N(0, a² I)
    std = x.std()
    assert abs(std - a) < 0.05, std
    assert abs(x.mean()) < 0.05


def test_dpm_solver_gaussian_vp():
    """Same check under VPSDE (α_t ≠ 1 exercises the full update)."""
    from iddiff.sampling.dpm import get_dpm_solver_sampler
    from iddiff.sde import VPSDE

    a = 1.0  # unit Gaussian data: diffused marginal stays N(0, I)
    d = 8
    sde = VPSDE(beta_min=0.1, beta_max=20.0, N=1000)

    class GaussModel:
        config = None

        def init(self, *a_, **kw):
            return {"params": {}}

        def apply(self, variables, x, labels, train=False, **kw):
            # marginal: N(0, (α²a² + σ²) I); score = -x / (α²a² + σ²).
            # VP convention: score = -model/std => model = -std·score
            t = labels / (sde.N - 1)
            alpha, sigma = sde.marginal_prob(jnp.ones_like(x), t)
            var = alpha[:, :1] ** 2 * a**2 + sigma[:, None] ** 2
            score = -x / var
            return -score * sigma[:, None]

    sampler = get_dpm_solver_sampler(
        sde, GaussModel(), (4096, d), steps=20, eps=1e-3
    )
    x = np.asarray(sampler(jax.random.PRNGKey(1), {}))
    assert abs(x.std() - 1.0) < 0.06, x.std()
    assert abs(x.mean()) < 0.06


def test_dpm_from_factory():
    import ml_collections

    from iddiff.sampling import get_sampling_fn
    from iddiff.sde import get_sde

    c = ml_collections.ConfigDict()
    c.training = ml_collections.ConfigDict(
        {"sde": "vesde", "continuous": True}
    )
    c.model = ml_collections.ConfigDict(
        {"name": "fcn", "state_size": 4, "hidden_layers": 1,
         "hidden_nodes": 16, "dropout": 0.0, "sigma_min": 1e-2,
         "sigma_max": 5.0, "num_scales": 100, "scale_by_sigma": True}
    )
    c.sampling = ml_collections.ConfigDict(
        {"method": "dpm", "steps": 8, "noise_removal": True}
    )
    c.data = ml_collections.ConfigDict({"use_data_mean": False})
    from iddiff.models import create_model
    from iddiff.sde import get_sde

    sde, eps = get_sde(c)
    model = create_model(c)
    params = model.init(jax.random.PRNGKey(0), jnp.ones((2, 4)),
                        jnp.zeros((2,)))["params"]
    fn = get_sampling_fn(c, sde, model, (16, 4), eps)
    out = fn(jax.random.PRNGKey(1), params)
    assert np.asarray(out).shape == (16, 4)
    assert np.isfinite(np.asarray(out)).all()
