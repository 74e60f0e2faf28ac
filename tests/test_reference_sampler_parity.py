"""Cross-framework parity: iddiff predictor/corrector steps vs the
REFERENCE's literal torch implementations (sampling/predictors.py,
sampling/correctors.py), on identical (x, t, z) with both RNG streams
pinned to the same Gaussian draw.

The score function on each side is built by that framework's own adapter
(models/utils.py get_score_fn vs iddiff.models.score_fn.get_score_fn)
around identical stub networks, so one predictor step exercises the whole
L2→L4 stack.

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
    make_data,
    make_flax_stub,
    make_sde_pair,
    make_torch_stub,
)

pytestmark = pytest.mark.skipif(
    not os.path.isfile(os.path.join(REF, "sampling", "predictors.py")),
    reason="reference repo not available",
)


@pytest.fixture(scope="module")
def ref_sampling():
    install_pl_stub(torch)
    sys.path.insert(0, REF)
    try:
        import sde_lib as ref_sde_lib
        from models import utils as ref_mutils
        from sampling import correctors as ref_correctors
        from sampling import predictors as ref_predictors
    finally:
        sys.path.remove(REF)
    return ref_predictors, ref_correctors, ref_sde_lib, ref_mutils


def _data(seed):
    return make_data(seed, grid_safe_t=True)


def _both_steps(ref_sampling, monkeypatch, sde_name, seed, z_pin=True):
    """Common setup: pinned z, both score stacks; returns a runner."""
    ref_predictors, ref_correctors, ref_sde_lib, ref_mutils = ref_sampling
    w, x, t, z = _data(seed)
    ref_sde, got_sde = make_sde_pair(sde_name, ref_sde_lib)
    ref_score = ref_mutils.get_score_fn(
        ref_sde, make_torch_stub(torch, w), conditional=False, train=False,
        continuous=True)
    from iddiff.models.score_fn import get_score_fn

    model, params = make_flax_stub(w)
    got_score = get_score_fn(got_sde, model, params, conditional=False,
                             train=False, continuous=True)
    if z_pin:
        monkeypatch.setattr(
            torch, "randn_like", lambda b, **k: torch.from_numpy(z))
        monkeypatch.setattr(
            jax.random, "normal",
            lambda key, shape, dtype=None: jnp.asarray(z))
    return (ref_predictors, ref_correctors, ref_sde, got_sde,
            ref_score, got_score, x, t)


PRED_CASES = [
    ("euler_maruyama", "vesde"), ("euler_maruyama", "vpsde"),
    ("reverse_diffusion", "vesde"), ("reverse_diffusion", "vpsde"),
    ("ancestral_sampling", "vesde"), ("ancestral_sampling", "vpsde"),
    ("heun", "vesde"),
]


@pytest.mark.parametrize("pred_name,sde_name", PRED_CASES)
def test_predictor_step_parity(ref_sampling, monkeypatch, pred_name,
                               sde_name):
    (ref_predictors, _, ref_sde, got_sde, ref_score, got_score,
     x, t) = _both_steps(
         ref_sampling, monkeypatch, sde_name,
         seed=100 + PRED_CASES.index((pred_name, sde_name)))

    ref_cls = ref_predictors.get_predictor(pred_name)
    kwargs = {"probability_flow": True} if pred_name == "heun" else {}
    want_x, want_mean = ref_cls(ref_sde, ref_score, **kwargs).update_fn(
        torch.from_numpy(x), torch.from_numpy(t))

    from iddiff.sampling.predictors import get_predictor

    step = get_predictor(pred_name)(got_sde, got_score, **kwargs)
    got_x, got_mean = step(jax.random.PRNGKey(1), jnp.asarray(x),
                           jnp.asarray(t))

    np.testing.assert_allclose(np.asarray(got_mean),
                               want_mean.detach().numpy(),
                               rtol=5e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_x), want_x.detach().numpy(),
                               rtol=5e-4, atol=1e-5)


CORR_CASES = [
    ("langevin", "vesde"), ("langevin", "vpsde"), ("ald", "vesde"),
]


@pytest.mark.parametrize("corr_name,sde_name", CORR_CASES)
def test_corrector_step_parity(ref_sampling, monkeypatch, corr_name,
                               sde_name):
    (_, ref_correctors, ref_sde, got_sde, ref_score, got_score,
     x, t) = _both_steps(
         ref_sampling, monkeypatch, sde_name,
         seed=200 + CORR_CASES.index((corr_name, sde_name)))

    snr, n_steps = 0.16, 1  # one step so the pinned draw aligns
    ref_cls = ref_correctors.get_corrector(corr_name)
    want_x, want_mean = ref_cls(ref_sde, ref_score, snr, n_steps).update_fn(
        torch.from_numpy(x), torch.from_numpy(t))

    from iddiff.sampling.correctors import get_corrector

    step = get_corrector(corr_name)(got_sde, got_score, snr, n_steps)
    got_x, got_mean = step(jax.random.PRNGKey(1), jnp.asarray(x),
                           jnp.asarray(t))

    np.testing.assert_allclose(np.asarray(got_mean),
                               want_mean.detach().numpy(),
                               rtol=5e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_x), want_x.detach().numpy(),
                               rtol=5e-4, atol=1e-5)


COND_PRED_CASES = [
    "conditional_euler_maruyama",
    "conditional_reverse_diffusion",
    "conditional_ancestral_sampling",
]


@pytest.mark.parametrize("pred_name", COND_PRED_CASES)
def test_conditional_predictor_step_parity(ref_sampling, monkeypatch,
                                           pred_name):
    """Conditional predictors on cVESDE with the dict-SDE score stack
    (sampling/predictors.py:119-234 + models/utils.py:285-293)."""
    ref_predictors, _, ref_sde_lib, ref_mutils = ref_sampling
    from iddiff.models.score_fn import (
        get_conditional_score_fn as got_cond_wrap,
        get_score_fn,
    )
    from iddiff.sde import CVESDE, VESDE

    seed = 300 + COND_PRED_CASES.index(pred_name)
    w, x, t, z = _data(seed)
    y = np.random.default_rng(seed + 50).normal(size=x.shape).astype(
        np.float32)

    ref_dict = {"x": ref_sde_lib.cVESDE(sigma_min=0.02, sigma_max=20.0, N=800),
                "y": ref_sde_lib.VESDE(sigma_min=0.05, sigma_max=5.0, N=800)}
    got_dict = {"x": CVESDE(sigma_min=0.02, sigma_max=20.0, N=800),
                "y": VESDE(sigma_min=0.05, sigma_max=5.0, N=800)}

    # dict-output stub nets matching across frameworks (same math as the
    # conditional adapter test)
    class RefDictStub(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.w = torch.nn.Parameter(torch.from_numpy(w))

        def forward(self, xx, labels):
            return {"x": xx["x"] * self.w + 0.01 * labels[:, None],
                    "y": xx["y"] * (2.0 * self.w) + 0.02 * labels[:, None]}

    import flax.linen as nn

    class GotDictStub(nn.Module):
        @nn.compact
        def __call__(self, xx, labels, train=False):
            ww = self.param("w", lambda k: jnp.asarray(w))
            return {"x": xx["x"] * ww + 0.01 * labels[:, None],
                    "y": xx["y"] * (2.0 * ww) + 0.02 * labels[:, None]}

    ref_score = ref_mutils.get_score_fn(
        ref_dict, RefDictStub(), conditional=True, train=False,
        continuous=True)
    ref_cond = ref_mutils.get_conditional_score_fn(ref_score, "x")

    model = GotDictStub()
    d = w.shape[0]
    params = model.init(jax.random.PRNGKey(0),
                        {"x": jnp.zeros((1, d)), "y": jnp.zeros((1, d))},
                        jnp.zeros((1,)))["params"]
    got_score = get_score_fn(got_dict, model, params, conditional=True,
                             train=False, continuous=True)
    got_cond = got_cond_wrap(got_score, "x")

    monkeypatch.setattr(
        torch, "randn_like", lambda b, **k: torch.from_numpy(z))
    monkeypatch.setattr(
        jax.random, "normal", lambda key, shape, dtype=None: jnp.asarray(z))

    ref_cls = ref_predictors.get_predictor(pred_name)
    ref_pred = ref_cls(ref_dict["x"], ref_cond)
    if pred_name == "conditional_ancestral_sampling":
        # the reference's update_fn was copy-pasted from the unconditional
        # predictor with signature (x, t) (predictors.py:229-234) and cannot
        # dispatch (x, y, t) at all — dead upstream; compare against the
        # intended per-SDE step directly
        want_x, want_mean = ref_pred.vesde_update_fn(
            torch.from_numpy(x), torch.from_numpy(y), torch.from_numpy(t))
    else:
        want_x, want_mean = ref_pred.update_fn(
            torch.from_numpy(x), torch.from_numpy(y), torch.from_numpy(t))

    from iddiff.sampling.predictors import get_predictor

    step = get_predictor(pred_name)(got_dict["x"], got_cond)
    got_x, got_mean = step(jax.random.PRNGKey(1), jnp.asarray(x),
                           jnp.asarray(y), jnp.asarray(t))

    np.testing.assert_allclose(np.asarray(got_mean),
                               want_mean.detach().numpy(),
                               rtol=5e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_x), want_x.detach().numpy(),
                               rtol=5e-4, atol=1e-5)


@pytest.mark.parametrize("denoise", [True, False])
@pytest.mark.parametrize("corr_name", ["none", "langevin"])
def test_pc_driver_loop_parity(ref_sampling, monkeypatch, corr_name,
                               denoise):
    """FULL PC sampling loop vs the reference driver
    (sampling/unconditional.py:165-199): same timestep grid, corrector→
    predictor order, and final-denoise logic, with ALL noise draws (prior +
    per-step) pinned to the same constants on both sides."""
    ref_predictors, ref_correctors, ref_sde_lib, ref_mutils = ref_sampling
    sys.path.insert(0, REF)
    try:
        from sampling import unconditional as ref_uncond
    finally:
        sys.path.remove(REF)

    N, B, d = 8, 4, 6
    seed = 400 + 2 * ["none", "langevin"].index(corr_name) + int(denoise)
    rng_np = np.random.default_rng(seed)
    w = rng_np.normal(size=(d,)).astype(np.float32)
    z0 = rng_np.normal(size=(B, d)).astype(np.float32)  # prior draw
    z = rng_np.normal(size=(B, d)).astype(np.float32)   # every step's draw

    ref_sde = ref_sde_lib.VESDE(sigma_min=0.05, sigma_max=8.0, N=N)
    monkeypatch.setattr(torch, "randn",
                        lambda *shape, **k: torch.from_numpy(z0))
    monkeypatch.setattr(torch, "randn_like",
                        lambda b, **k: torch.from_numpy(z))

    ref_model = make_torch_stub(torch, w)
    ref_model.device = torch.device("cpu")
    ref_sampler = ref_uncond.get_pc_sampler(
        sde=ref_sde, shape=(B, d),
        predictor=ref_predictors.get_predictor("reverse_diffusion"),
        corrector=ref_correctors.get_corrector(corr_name),
        snr=0.16, n_steps=1, probability_flow=False, continuous=True,
        denoise=denoise, eps=1e-3)
    want, _info = ref_sampler(ref_model)

    from iddiff.sde import VESDE
    from iddiff.sampling.pc import get_pc_sampler

    # pin prior + per-step draws to the same constants (the jitted scan
    # folds the patched draw in as a constant, matching torch's constant)
    calls = {"n": 0}

    def fake_normal(key, shape, dtype=None):
        # first draw inside the sampler is the prior (B, d); all step draws
        # have the same shape here, so pin prior -> z0 then z forever
        calls["n"] += 1
        return jnp.asarray(z0 if calls["n"] == 1 else z)

    monkeypatch.setattr(jax.random, "normal", fake_normal)
    got_sde = VESDE(sigma_min=0.05, sigma_max=8.0, N=N)
    model, params = make_flax_stub(w)
    sampler = get_pc_sampler(
        got_sde, model, (B, d), predictor="reverse_diffusion",
        corrector=corr_name, snr=0.16, n_steps_each=1, denoise=denoise,
        eps=1e-3)
    out = sampler(jax.random.PRNGKey(0), params)
    got = out[0] if isinstance(out, tuple) else out

    np.testing.assert_allclose(np.asarray(got), want.detach().numpy(),
                               rtol=2e-3, atol=1e-4)


def test_pc_inpainter_loop_parity(ref_sampling, monkeypatch):
    """FULL PC inpainting loop vs the reference
    (sampling/unconditional.py:201-316) with all draws pinned; denoise=False
    (the reference's denoise=True return carries the noisy x on the unknown
    region — documented deviation, see iddiff/sampling/pc.py)."""
    ref_predictors, ref_correctors, ref_sde_lib, _ = ref_sampling
    sys.path.insert(0, REF)
    try:
        from sampling import unconditional as ref_uncond
    finally:
        sys.path.remove(REF)

    N, B, d = 6, 3, 8
    rng_np = np.random.default_rng(77)
    w = rng_np.normal(size=(d,)).astype(np.float32)
    data = rng_np.normal(size=(B, d)).astype(np.float32)
    mask = (rng_np.uniform(size=(B, d)) < 0.5).astype(np.float32)
    z0 = rng_np.normal(size=(B, d)).astype(np.float32)
    z = rng_np.normal(size=(B, d)).astype(np.float32)

    ref_sde = ref_sde_lib.VESDE(sigma_min=0.05, sigma_max=8.0, N=N)
    monkeypatch.setattr(torch, "randn",
                        lambda *shape, **k: torch.from_numpy(z0))
    monkeypatch.setattr(torch, "randn_like",
                        lambda b, **k: torch.from_numpy(z))

    ref_model = make_torch_stub(torch, w)
    ref_model.device = torch.device("cpu")
    ref_inpainter = ref_uncond.get_pc_inpainter(
        sde=ref_sde,
        predictor=ref_predictors.get_predictor("reverse_diffusion"),
        corrector=ref_correctors.get_corrector("none"),
        snr=0.16, n_steps=1, probability_flow=False, continuous=True,
        denoise=False, eps=1e-3)
    want, _ = ref_inpainter(ref_model, torch.from_numpy(data),
                            torch.from_numpy(mask))

    from iddiff.sde import VESDE
    from iddiff.sampling.pc import get_pc_inpainter

    calls = {"n": 0}

    def fake_normal(key, shape, dtype=None):
        calls["n"] += 1
        return jnp.asarray(z0 if calls["n"] == 1 else z)

    monkeypatch.setattr(jax.random, "normal", fake_normal)
    model, params = make_flax_stub(w)
    inpainter = get_pc_inpainter(
        VESDE(sigma_min=0.05, sigma_max=8.0, N=N), model,
        predictor="reverse_diffusion", corrector="none", snr=0.16,
        n_steps_each=1, denoise=False, eps=1e-3)
    got = inpainter(jax.random.PRNGKey(0), params, jnp.asarray(data),
                    jnp.asarray(mask))

    np.testing.assert_allclose(np.asarray(got), want.detach().numpy(),
                               rtol=2e-3, atol=1e-4)


@pytest.mark.parametrize("use_path", [False, True])
def test_conditional_driver_loop_parity(ref_sampling, monkeypatch, use_path):
    """FULL conditional PC loop vs the reference driver
    (sampling/conditional.py:47-253): per-step y-perturbation (or the
    backward-kernel use_path chain), predictor->corrector order, denoise —
    all noise draws pinned on both sides."""
    ref_predictors, ref_correctors, ref_sde_lib, ref_mutils = ref_sampling
    sys.path.insert(0, REF)
    try:
        from sampling import conditional as ref_cond_mod
    finally:
        sys.path.remove(REF)

    P, B, d = 6, 3, 5
    rng_np = np.random.default_rng(88 + use_path)
    w = rng_np.normal(size=(d,)).astype(np.float32)
    y = rng_np.normal(size=(B, d)).astype(np.float32)
    z0 = rng_np.normal(size=(B, d)).astype(np.float32)
    z = rng_np.normal(size=(B, d)).astype(np.float32)

    ref_dict = {"x": ref_sde_lib.cVESDE(sigma_min=0.02, sigma_max=8.0, N=P),
                "y": ref_sde_lib.VESDE(sigma_min=0.05, sigma_max=4.0, N=P)}

    class RefDictStub(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.w = torch.nn.Parameter(torch.from_numpy(w))
            self.device = torch.device("cpu")

        def forward(self, xx, labels):
            return {"x": xx["x"] * self.w + 0.01 * labels[:, None],
                    "y": xx["y"] * (2.0 * self.w) + 0.02 * labels[:, None]}

    monkeypatch.setattr(torch, "randn",
                        lambda *shape, **k: torch.from_numpy(z0))
    monkeypatch.setattr(torch, "randn_like",
                        lambda b, **k: torch.from_numpy(z))
    ref_sampler = ref_cond_mod.get_pc_conditional_sampler(
        sde=ref_dict, shape=(B, d),
        predictor=ref_predictors.get_predictor(
            "conditional_reverse_diffusion"),
        corrector=ref_correctors.get_corrector("conditional_langevin"),
        snr=0.16, p_steps=P, c_steps=1, probability_flow=False,
        continuous=True, denoise=True, use_path=use_path, eps=1e-3)
    want, _ = ref_sampler(RefDictStub(), torch.from_numpy(y))

    from iddiff.sde import CVESDE, VESDE
    from iddiff.sampling.conditional import get_pc_conditional_sampler

    import flax.linen as nn

    class GotDictStub(nn.Module):
        @nn.compact
        def __call__(self, xx, labels, train=False):
            ww = self.param("w", lambda k: jnp.asarray(w))
            return {"x": xx["x"] * ww + 0.01 * labels[:, None],
                    "y": xx["y"] * (2.0 * ww) + 0.02 * labels[:, None]}

    got_dict = {"x": CVESDE(sigma_min=0.02, sigma_max=8.0, N=P),
                "y": VESDE(sigma_min=0.05, sigma_max=4.0, N=P)}
    model = GotDictStub()
    params = model.init(jax.random.PRNGKey(0),
                        {"x": jnp.zeros((1, d)), "y": jnp.zeros((1, d))},
                        jnp.zeros((1,)))["params"]

    calls = {"n": 0}

    def fake_normal(key, shape, dtype=None):
        calls["n"] += 1
        return jnp.asarray(z0 if calls["n"] == 1 else z)

    monkeypatch.setattr(jax.random, "normal", fake_normal)
    sampler = get_pc_conditional_sampler(
        got_dict, model, (B, d), predictor="conditional_reverse_diffusion",
        corrector="conditional_langevin", snr=0.16, p_steps=P, c_steps=1,
        denoise=True, use_path=use_path, eps=1e-3)
    got = sampler(jax.random.PRNGKey(0), params, jnp.asarray(y))

    np.testing.assert_allclose(np.asarray(got), want.detach().numpy(),
                               rtol=2e-3, atol=1e-4)


@pytest.mark.parametrize("denoise", [False, True])
def test_ode_sampler_parity(ref_sampling, monkeypatch, denoise):
    """Probability-flow ODE sampler vs the reference's scipy RK45 driver
    (sampling/unconditional.py:66-131), same pinned prior; solvers differ so
    values agree to solver tolerance."""
    ref_predictors, _, ref_sde_lib, _ = ref_sampling
    sys.path.insert(0, REF)
    try:
        from sampling import unconditional as ref_uncond
    finally:
        sys.path.remove(REF)

    B, d = 3, 5
    rng_np = np.random.default_rng(99 + denoise)
    w = 0.1 * rng_np.normal(size=(d,)).astype(np.float32)
    z0 = rng_np.normal(size=(B, d)).astype(np.float32)

    ref_sde = ref_sde_lib.VESDE(sigma_min=0.05, sigma_max=6.0, N=100)
    monkeypatch.setattr(torch, "randn",
                        lambda *shape, **k: torch.from_numpy(z0))
    monkeypatch.setattr(torch, "randn_like",
                        lambda b, **k: torch.from_numpy(np.zeros_like(z0)))

    ref_model = make_torch_stub(torch, w)
    ref_model.device = torch.device("cpu")
    ref_sampler = ref_uncond.get_ode_sampler(
        sde=ref_sde, shape=(B, d), denoise=denoise, rtol=1e-5, atol=1e-5,
        eps=1e-3)
    want, ref_nfe = ref_sampler(ref_model)

    from iddiff.sde import VESDE
    from iddiff.sampling.ode import get_ode_sampler

    monkeypatch.setattr(
        jax.random, "normal",
        lambda key, shape, dtype=None: jnp.asarray(z0))
    model, params = make_flax_stub(w)
    sampler = get_ode_sampler(
        VESDE(sigma_min=0.05, sigma_max=6.0, N=100), model, (B, d),
        denoise=denoise, rtol=1e-5, atol=1e-5, eps=1e-3)
    got, got_nfe = sampler(jax.random.PRNGKey(0), params)

    np.testing.assert_allclose(np.asarray(got), want.detach().numpy(),
                               rtol=2e-3, atol=2e-3)
