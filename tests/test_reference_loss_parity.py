"""Cross-framework parity: iddiff score adapter, DSM loss, and dimension
read-out vs the REFERENCE's literal torch/numpy code.

- /root/reference/losses.py and /root/reference/models/utils.py import
  cleanly on CPU, so the unconditional DSM loss and the score-fn adapter
  are compared end-to-end on identical (x, t, z) by pinning both RNGs
  (torch.rand/randn_like on the reference side, jax.random.uniform/normal
  on ours) to the same draws.
- /root/reference/plot_utils.py needs torchvision, so `plot_dims` /
  `extract_sing_vals` are AST-extracted and exec'd with a stub plt; the
  reference read-out is then run on OUR saved spectra artifact
  (golden-file compatibility) and on synthetic spectra.

Skipped when /root/reference or torch is absent.
"""
import ast
import os
import pickle
import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from _reference_stubs import (  # noqa: E402
    REF,
    install_pl_stub,
    make_data as _data,
    make_flax_stub as _flax_stub,
    make_sde_pair as _sde_pair,
    make_torch_stub,
)

pytestmark = pytest.mark.skipif(
    not os.path.isfile(os.path.join(REF, "losses.py")),
    reason="reference repo not available",
)


def _TorchStub(w):
    return make_torch_stub(torch, w)


@pytest.fixture(scope="module")
def ref_modules():
    # get_score_fn lazily imports models.ksphere_gt (models/utils.py:169),
    # whose class statement subclasses pl.LightningModule; stub the absent
    # pytorch_lightning with torch.nn.Module so the literal code runs.
    install_pl_stub(torch)
    sys.path.insert(0, REF)
    try:
        import losses as ref_losses
        import sde_lib as ref_sde_lib
        from models import utils as ref_mutils
    finally:
        sys.path.remove(REF)
    return ref_losses, ref_sde_lib, ref_mutils


# ---------------------------------------------------------------------------
# score adapter (models/utils.py:236-282 vs iddiff/models/score_fn.py)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("sde_name,continuous", [
    ("vesde", True), ("vpsde", True), ("vpsde", False),
])
def test_score_adapter_parity(ref_modules, sde_name, continuous):
    _, ref_sde_lib, ref_mutils = ref_modules
    from iddiff.models.score_fn import get_score_fn

    w, x, t, _ = _data(10)
    ref_sde, got_sde = _sde_pair(sde_name, ref_sde_lib)

    ref_score = ref_mutils.get_score_fn(
        ref_sde, _TorchStub(w), conditional=False, train=False,
        continuous=continuous,
    )(torch.from_numpy(x), torch.from_numpy(t)).detach().numpy()

    model, params = _flax_stub(w)
    got_score = np.asarray(get_score_fn(
        got_sde, model, params, conditional=False, train=False,
        continuous=continuous,
    )(jnp.asarray(x), jnp.asarray(t)))

    np.testing.assert_allclose(got_score, ref_score, rtol=2e-4, atol=1e-5)


class _TorchDictStub(torch.nn.Module):
    """Conditional stub: input is a dict {'x','y'}; output a tensor (SR3)
    or a dict (multi-SDE), mirroring how the reference's conditional nets
    are fed through get_score_fn (models/utils.py:179-232)."""

    def __init__(self, w, dict_out):
        super().__init__()
        self.w = torch.nn.Parameter(torch.from_numpy(w))
        self.dict_out = dict_out

    def forward(self, x, labels):
        hx = x["x"] * self.w + 0.01 * labels[:, None]
        hy = x["y"] * (2.0 * self.w) + 0.02 * labels[:, None]
        if self.dict_out:
            return {"x": hx, "y": hy}
        return hx + 0.5 * hy


def _flax_dict_stub(w, dict_out):
    import flax.linen as nn

    class FlaxDictStub(nn.Module):
        @nn.compact
        def __call__(self, x, labels, train=False):
            ww = self.param("w", lambda k: jnp.asarray(w))
            hx = x["x"] * ww + 0.01 * labels[:, None]
            hy = x["y"] * (2.0 * ww) + 0.02 * labels[:, None]
            if dict_out:
                return {"x": hx, "y": hy}
            return hx + 0.5 * hy

    model = FlaxDictStub()
    d = w.shape[0]
    dummy = {"x": jnp.zeros((1, d)), "y": jnp.zeros((1, d))}
    params = model.init(jax.random.PRNGKey(0), dummy, jnp.zeros((1,)))["params"]
    return model, params


@pytest.mark.parametrize("sde_kind,continuous", [
    ("sr3_ve", True), ("sr3_ve", False),
    ("sr3_vp", True), ("sr3_vp", False),
    ("dict", True), ("dict", False),
])
def test_conditional_score_adapter_parity(ref_modules, sde_kind, continuous):
    """Conditional branches incl. the reference's no-sign-flip quirk
    (models/utils.py:179-232) and divide_by_sigmas (:50-74)."""
    _, ref_sde_lib, ref_mutils = ref_modules
    from iddiff.models.score_fn import get_score_fn
    from iddiff.sde import CVESDE, VESDE, VPSDE

    w, x, t, _ = _data(20)
    y = np.random.default_rng(21).normal(size=x.shape).astype(np.float32)
    # keep t strictly inside grid cells so round/long agree in discrete mode
    t = ((np.round(t * 799.0) + 0.3) / 799.0).astype(np.float32)

    if sde_kind == "sr3_ve":
        ref_sde = ref_sde_lib.cVESDE(sigma_min=0.02, sigma_max=10.0, N=800)
        got_sde = CVESDE(sigma_min=0.02, sigma_max=10.0, N=800)
        dict_out = False
    elif sde_kind == "sr3_vp":
        ref_sde = ref_sde_lib.VPSDE(beta_min=0.1, beta_max=20.0, N=800)
        got_sde = VPSDE(beta_min=0.1, beta_max=20.0, N=800)
        dict_out = False
    else:
        ref_sde = {"x": ref_sde_lib.cVESDE(sigma_min=0.02, sigma_max=10.0, N=800),
                   "y": ref_sde_lib.VESDE(sigma_min=0.05, sigma_max=5.0, N=800)}
        got_sde = {"x": CVESDE(sigma_min=0.02, sigma_max=10.0, N=800),
                   "y": VESDE(sigma_min=0.05, sigma_max=5.0, N=800)}
        dict_out = True

    ref_in = {"x": torch.from_numpy(x), "y": torch.from_numpy(y)}
    want = ref_mutils.get_score_fn(
        ref_sde, _TorchDictStub(w, dict_out), conditional=True, train=False,
        continuous=continuous,
    )(ref_in, torch.from_numpy(t))

    model, params = _flax_dict_stub(w, dict_out)
    got = get_score_fn(
        got_sde, model, params, conditional=True, train=False,
        continuous=continuous,
    )({"x": jnp.asarray(x), "y": jnp.asarray(y)}, jnp.asarray(t))

    if dict_out:
        for k in ("x", "y"):
            np.testing.assert_allclose(
                np.asarray(got[k]), want[k].detach().numpy(),
                rtol=2e-4, atol=1e-5)
    else:
        np.testing.assert_allclose(
            np.asarray(got), want.detach().numpy(), rtol=2e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# unconditional DSM loss (losses.py:163-188 vs iddiff/losses/dsm.py) with
# both RNG streams pinned to identical (t, z)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("sde_name", ["vesde", "vpsde"])
@pytest.mark.parametrize("likelihood_weighting", [True, False])
@pytest.mark.parametrize("reduce_mean", [True, False])
def test_dsm_loss_parity(ref_modules, monkeypatch, sde_name,
                         likelihood_weighting, reduce_mean):
    ref_losses, ref_sde_lib, _ = ref_modules
    from iddiff.losses import get_sde_loss_fn

    eps = 1e-5
    w, x, _, z = _data(11)
    n = x.shape[0]
    u = np.random.default_rng(12).uniform(size=(n,)).astype(np.float32)
    ref_sde, got_sde = _sde_pair(sde_name, ref_sde_lib)
    t_forced = (u * (ref_sde.T - eps) + eps).astype(np.float32)

    # reference side: pin torch.rand / torch.randn_like
    monkeypatch.setattr(torch, "rand", lambda *a, **k: torch.from_numpy(u))
    monkeypatch.setattr(
        torch, "randn_like", lambda b, **k: torch.from_numpy(z))
    ref_loss_fn = ref_losses.get_general_sde_loss_fn(
        ref_sde, train=False, conditional=False, reduce_mean=reduce_mean,
        continuous=True, likelihood_weighting=likelihood_weighting, eps=eps)
    want = float(ref_loss_fn(_TorchStub(w), torch.from_numpy(x)))

    # iddiff side: pin jax.random.uniform / jax.random.normal
    monkeypatch.setattr(
        jax.random, "uniform",
        lambda key, shape, dtype=None, minval=0.0, maxval=1.0:
            jnp.asarray(t_forced))
    monkeypatch.setattr(
        jax.random, "normal",
        lambda key, shape, dtype=None: jnp.asarray(z))
    model, params = _flax_stub(w)
    got_loss_fn = get_sde_loss_fn(
        got_sde, model, train=False, conditional=False,
        reduce_mean=reduce_mean, continuous=True,
        likelihood_weighting=likelihood_weighting, eps=eps)
    got = float(got_loss_fn(params, jnp.asarray(x), jax.random.PRNGKey(0)))

    np.testing.assert_allclose(got, want, rtol=2e-4)


# ---------------------------------------------------------------------------
# dimension read-out (plot_utils.py:207-238) on our saved spectra artifact
# ---------------------------------------------------------------------------

class _StubPlt:
    """matplotlib.pyplot stand-in so plot_dims' literal body can run."""

    rcParams = {}

    def hist(self, dims, bins):
        return None, np.asarray(bins), []

    def gcf(self):
        return None

    def __getattr__(self, name):  # grid/figure/xlabel/title/xticks/...
        return lambda *a, **k: None


@pytest.fixture(scope="module")
def ref_plot_dims():
    path = os.path.join(REF, "plot_utils.py")
    with open(path) as f:
        tree = ast.parse(f.read())
    ns = {"np": np, "plt": _StubPlt()}
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name in (
                "plot_dims", "extract_sing_vals"):
            exec(compile(ast.Module(body=[node], type_ignores=[]),
                         path, "exec"), ns)
    assert "plot_dims" in ns and "extract_sing_vals" in ns
    return ns["plot_dims"]


def test_readout_parity_synthetic(ref_plot_dims):
    """Reference softmax-gap rule == iddiff readout on random spectra."""
    from iddiff.id.readout import dims_from_spectra

    rng = np.random.default_rng(3)
    spectra = -np.sort(-rng.gamma(2.0, 2.0, size=(24, 32)), axis=1)
    svd = {"singular_values": [list(map(float, s)) for s in spectra]}
    _, want = ref_plot_dims(svd)
    got = dims_from_spectra(spectra)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_readout_parity_golden_artifact(ref_plot_dims):
    """The reference's own plot_dims consumes OUR saved spectra pickle and
    reads out the same dims as iddiff (format + rule compatibility)."""
    from iddiff.id.readout import dims_from_spectra

    art = os.path.join(os.path.dirname(__file__), "..",
                       "artifacts", "squares10_paper_svd.pkl")
    if not os.path.isfile(art):
        pytest.skip("no saved spectra artifact")
    with open(art, "rb") as f:
        svd = pickle.load(f)
    assert "singular_values" in svd
    _, want = ref_plot_dims(svd)
    got = dims_from_spectra(np.asarray(svd["singular_values"]))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("sde_name", ["vesde", "vpsde"])
def test_dsm_loss_gradient_parity(ref_modules, monkeypatch, sde_name):
    """d(loss)/d(weights) agrees between torch autograd and jax.grad on the
    same pinned (x, t, z) — validates the whole differentiation path
    through adapter + loss."""
    ref_losses, ref_sde_lib, _ = ref_modules
    from iddiff.losses import get_sde_loss_fn

    eps = 1e-5
    w, x, _, z = _data(13)
    n = x.shape[0]
    u = np.random.default_rng(14).uniform(size=(n,)).astype(np.float32)
    ref_sde, got_sde = _sde_pair(sde_name, ref_sde_lib)
    t_forced = (u * (ref_sde.T - eps) + eps).astype(np.float32)

    monkeypatch.setattr(torch, "rand", lambda *a, **k: torch.from_numpy(u))
    monkeypatch.setattr(
        torch, "randn_like", lambda b, **k: torch.from_numpy(z))
    ref_loss_fn = ref_losses.get_general_sde_loss_fn(
        ref_sde, train=True, conditional=False, reduce_mean=True,
        continuous=True, likelihood_weighting=True, eps=eps)
    ref_net = _TorchStub(w)
    ref_loss = ref_loss_fn(ref_net, torch.from_numpy(x))
    ref_loss.backward()
    want_grad = ref_net.w.grad.detach().numpy()

    monkeypatch.setattr(
        jax.random, "uniform",
        lambda key, shape, dtype=None, minval=0.0, maxval=1.0:
            jnp.asarray(t_forced))
    monkeypatch.setattr(
        jax.random, "normal",
        lambda key, shape, dtype=None: jnp.asarray(z))
    model, params = _flax_stub(w)
    got_loss_fn = get_sde_loss_fn(
        got_sde, model, train=True, conditional=False, reduce_mean=True,
        continuous=True, likelihood_weighting=True, eps=eps)
    got_grad = jax.grad(
        lambda p: got_loss_fn(p, jnp.asarray(x), jax.random.PRNGKey(0))
    )(params)["w"]

    np.testing.assert_allclose(np.asarray(got_grad), want_grad,
                               rtol=5e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# PSNR/SSIM metric parity (lightning_callbacks/evaluation_tools.py:15-91)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ref_metrics():
    """AST-extract calculate_psnr/ssim/calculate_ssim (module-level
    torchvision import blocks a plain import; cv2 is available)."""
    import math

    cv2 = pytest.importorskip("cv2")
    path = os.path.join(REF, "lightning_callbacks", "evaluation_tools.py")
    with open(path) as f:
        tree = ast.parse(f.read())
    ns = {"np": np, "math": math, "cv2": cv2}
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name in (
                "calculate_psnr", "ssim", "calculate_ssim"):
            exec(compile(ast.Module(body=[node], type_ignores=[]),
                         path, "exec"), ns)
    return ns


def test_psnr_ssim_metric_parity(ref_metrics):
    """iddiff PSNR/SSIM == the reference's numpy/cv2 implementations on
    [0,255] images (the reference's test-mode metrics)."""
    from iddiff.analysis.evaluation import psnr, ssim

    rng = np.random.default_rng(5)
    a = rng.uniform(0, 255, size=(24, 24, 3)).astype(np.float64)
    b = np.clip(a + rng.normal(0, 12, size=a.shape), 0, 255)

    np.testing.assert_allclose(
        psnr(a, b, data_range=255.0), ref_metrics["calculate_psnr"](a, b),
        rtol=1e-10)
    np.testing.assert_allclose(
        ssim(a, b, data_range=255.0), ref_metrics["calculate_ssim"](a, b),
        rtol=1e-6)
    # grayscale branch too (evaluation_tools.py:64-80)
    np.testing.assert_allclose(
        ssim(a[..., 0], b[..., 0], data_range=255.0),
        ref_metrics["calculate_ssim"](a[..., 0], b[..., 0]), rtol=1e-6)


def test_mle_estimator_parity():
    """intrinsic_dim_sample_wise matches the reference's literal mle.py
    (numpy-only, imports clean) point-for-point; mle_id is the
    maxLikGlobalDimEst form used by the reference's benchmark harness."""
    sys.path.insert(0, REF)
    try:
        import mle as ref_mle
    finally:
        sys.path.remove(REF)
    from iddiff.analysis.mle import intrinsic_dim_sample_wise, mle_id

    rng = np.random.default_rng(42)
    X = rng.normal(size=(200, 4)).astype(np.float64)
    for k in (5, 10):
        want = ref_mle.intrinsic_dim_sample_wise(X, k=k)
        got = intrinsic_dim_sample_wise(X, k=k)
        np.testing.assert_allclose(got, want, rtol=1e-8)
    # global form: inverse of the pooled mean of 1/(k-1)-normalized logs
    # == (k-1)/mean(S_i); sanity-check the closed relation on the same X
    k = 5
    want_pp = ref_mle.intrinsic_dim_sample_wise(X, k=k)
    pooled = 1.0 / np.mean((k - 2) / want_pp / (k - 1))
    np.testing.assert_allclose(mle_id(X, k=k), pooled, rtol=1e-8)
