"""Torch->flax checkpoint import: converted reference weights reproduce the
reference net's forward pass.

The REFERENCE's own torch models (models/ddpm.py DDPM, models/fcn.py FCN)
are instantiated on CPU with random init, their state_dicts converted by
iddiff.compat, and both frameworks' forwards compared on identical inputs.
This is the strongest L2 parity evidence available without a GPU, and it
IS the migration path for reference users with trained checkpoints.

Skipped when /root/reference or torch is absent.
"""
import os
import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402
import ml_collections  # noqa: E402

from _reference_stubs import (  # noqa: E402
    REF,
    install_op_stub,
    install_pl_stub,
    install_torchvision_stub,
)
pytestmark = pytest.mark.skipif(
    not os.path.isfile(os.path.join(REF, "models", "ddpm.py")),
    reason="reference repo not available",
)


@pytest.fixture(scope="module")
def ref_models():
    # models/ddpm.py imports pytorch_lightning and torchvision at module
    # level (for the KxSR variant's Resize); stub both so the literal code
    # imports on this image.
    install_pl_stub(torch)
    install_torchvision_stub()
    sys.path.insert(0, REF)
    try:
        from models import ddpm as ref_ddpm
        from models import fcn as ref_fcn
    finally:
        sys.path.remove(REF)
    return ref_ddpm, ref_fcn


def _ddpm_config():
    c = ml_collections.ConfigDict()
    c.model = ml_collections.ConfigDict(dict(
        name="ddpm", nf=128, ch_mult=(1, 2), num_res_blocks=1,
        attn_resolutions=(8,), dropout=0.0, resamp_with_conv=True,
        conditional=True, nonlinearity="swish",
        input_channels=1, output_channels=1, num_scales=1000,
        ema_rate=0.999,
    ))
    c.data = ml_collections.ConfigDict(dict(
        image_size=16, effective_image_size=16, centered=True,
        num_channels=1,
    ))
    return c


def test_ddpm_checkpoint_import_forward_parity(ref_models):
    ref_ddpm, _ = ref_models
    from iddiff.compat import convert_reference_checkpoint
    from iddiff.models import create_model

    config = _ddpm_config()
    torch.manual_seed(0)
    ref_net = ref_ddpm.DDPM(config).eval()

    rng = np.random.default_rng(5)
    x = rng.normal(size=(2, 1, 16, 16)).astype(np.float32)
    labels = np.asarray([3.7, 871.2], dtype=np.float32)
    with torch.no_grad():
        want = ref_net(torch.from_numpy(x),
                       torch.from_numpy(labels)).numpy()

    # wrap as a Lightning-style checkpoint to exercise prefix stripping
    state = {"state_dict": {f"score_model.{k}": v
                            for k, v in ref_net.state_dict().items()}}
    params = convert_reference_checkpoint(state, config)

    model = create_model(config)
    got = model.apply({"params": params},
                      jnp.asarray(x.transpose(0, 2, 3, 1)),
                      jnp.asarray(labels))
    got = np.asarray(got).transpose(0, 3, 1, 2)

    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


def test_ddpm_import_param_tree_matches_init(ref_models):
    """Converted tree has exactly the shapes/leaves of a fresh flax init."""
    ref_ddpm, _ = ref_models
    from iddiff.compat import convert_reference_checkpoint
    from iddiff.models import create_model

    config = _ddpm_config()
    torch.manual_seed(1)
    ref_net = ref_ddpm.DDPM(config)
    params = convert_reference_checkpoint(ref_net.state_dict(), config)

    model = create_model(config)
    init = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 1)),
                      jnp.zeros((1,)))["params"]

    flat_init = jax.tree_util.tree_leaves_with_path(init)
    flat_conv = jax.tree_util.tree_leaves_with_path(
        jax.tree_util.tree_map(jnp.asarray, params))
    paths_init = {jax.tree_util.keystr(p): l.shape for p, l in flat_init}
    paths_conv = {jax.tree_util.keystr(p): l.shape for p, l in flat_conv}
    assert paths_init == paths_conv


def test_fcn_checkpoint_import_forward_parity(ref_models):
    _, ref_fcn = ref_models
    from iddiff.compat import convert_reference_checkpoint
    from iddiff.models import create_model

    c = ml_collections.ConfigDict()
    c.model = ml_collections.ConfigDict(dict(
        name="fcn", state_size=7, hidden_layers=2, hidden_nodes=32,
        dropout=0.0, num_scales=1000, ema_rate=0.999,
    ))
    c.data = ml_collections.ConfigDict(dict(shape=[7]))

    torch.manual_seed(2)
    ref_net = ref_fcn.FCN(c).eval()
    rng = np.random.default_rng(6)
    x = rng.normal(size=(5, 7)).astype(np.float32)
    t = rng.uniform(0.0, 1.0, size=(5,)).astype(np.float32)
    with torch.no_grad():
        want = ref_net(torch.from_numpy(x), torch.from_numpy(t)).numpy()

    params = convert_reference_checkpoint(ref_net.state_dict(), c)
    model = create_model(c)
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x),
                                 jnp.asarray(t)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.fixture(scope="module")
def ref_ncsnpp(ref_models):
    """Import the reference NCSN++; `from op import upfirdn2d`
    (up_or_down_sampling.py:10) would JIT-compile CUDA, so 'op' is stubbed
    with the torch-native fallback extracted from op/upfirdn2d.py."""
    install_op_stub(torch)
    sys.path.insert(0, REF)
    try:
        from models import ncsnpp as ref_ncsnpp_mod
    finally:
        sys.path.remove(REF)
    return ref_ncsnpp_mod


def _ncsnpp_config(progressive=False):
    c = ml_collections.ConfigDict()
    c.model = ml_collections.ConfigDict(dict(
        name="ncsnpp", nf=32, ch_mult=(1, 2), num_res_blocks=2,
        attn_resolutions=(8,), dropout=0.0, resamp_with_conv=True,
        conditional=True, fir=True, fir_kernel=[1, 3, 3, 1],
        skip_rescale=True, resblock_type="biggan",
        progressive="output_skip" if progressive else "none",
        progressive_input="input_skip" if progressive else "none",
        embedding_type="fourier", fourier_scale=16.0, init_scale=1e-2,
        progressive_combine="sum", nonlinearity="swish",
        input_channels=3, output_channels=3, num_scales=1000,
        ema_rate=0.999,
    ))
    c.data = ml_collections.ConfigDict(dict(
        image_size=16, effective_image_size=16, centered=True,
        num_channels=3,
    ))
    c.training = ml_collections.ConfigDict(dict(continuous=True))
    return c


@pytest.mark.parametrize("progressive", [False, True])
def test_ncsnpp_checkpoint_import_forward_parity(ref_ncsnpp, progressive):
    """Structural converter: reference NCSN++ (biggan + FIR + skip_rescale,
    optionally progressive input_skip/output_skip pyramids) ports to flax
    and reproduces the torch forward."""
    from iddiff.compat import convert_reference_checkpoint
    from iddiff.models import create_model

    config = _ncsnpp_config(progressive)
    torch.manual_seed(3 + progressive)
    ref_net = ref_ncsnpp.NCSNpp(config).eval()

    rng = np.random.default_rng(8)
    x = rng.normal(size=(2, 3, 16, 16)).astype(np.float32)
    t = np.asarray([0.21, 0.87], dtype=np.float32)
    with torch.no_grad():
        want = ref_net(torch.from_numpy(x), torch.from_numpy(t)).numpy()

    params = convert_reference_checkpoint(ref_net.state_dict(), config)
    model = create_model(config)
    got = model.apply({"params": params},
                      jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t))
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=5e-4)


def test_ema_weights_preferred_from_lightning_checkpoint(ref_models):
    """prefer_ema=True uses the EMAOptimizer shadow tuple from
    optimizer_states (ema.py:300-325) — the weights the reference itself
    evaluates with — re-keyed by state_dict order."""
    _, ref_fcn = ref_models
    from iddiff.compat import convert_reference_checkpoint

    c = ml_collections.ConfigDict()
    c.model = ml_collections.ConfigDict(dict(
        name="fcn", state_size=3, hidden_layers=1, hidden_nodes=8,
        dropout=0.0, num_scales=1000, ema_rate=0.999,
    ))
    c.data = ml_collections.ConfigDict(dict(shape=[3]))

    torch.manual_seed(4)
    ref_net = ref_fcn.FCN(c)
    sd = {f"score_model.{k}": v for k, v in ref_net.state_dict().items()}
    # EMA shadow = 2x the raw weights, stored as a flat tuple in
    # parameters() order like the reference EMAOptimizer does
    ckpt = {
        "state_dict": sd,
        "optimizer_states": [{
            "opt": {}, "ema": tuple(2.0 * v for v in sd.values()),
            "current_step": 10, "decay": 0.999, "every_n_steps": 1,
        }],
    }

    raw = convert_reference_checkpoint(ckpt, c, prefer_ema=False)
    ema = convert_reference_checkpoint(ckpt, c, prefer_ema=True)
    for k in raw["net"]:
        for leaf in raw["net"][k]:
            np.testing.assert_allclose(
                np.asarray(ema["net"][k][leaf]),
                2.0 * np.asarray(raw["net"][k][leaf]), rtol=1e-6)


def test_structural_converter_agrees_with_ddpm_walk(ref_models):
    """convert_by_structure and the explicit DDPM constructor-walk converter
    must produce identical trees — each validates the other."""
    ref_ddpm, _ = ref_models
    from iddiff.compat import convert_ddpm_state_dict
    from iddiff.compat.torch_import import convert_by_structure
    from iddiff.models import create_model

    config = _ddpm_config()
    torch.manual_seed(5)
    ref_net = ref_ddpm.DDPM(config)
    sd = ref_net.state_dict()

    walk = convert_ddpm_state_dict(sd, config)
    model = create_model(config)
    struct = convert_by_structure(
        sd, model, (jnp.zeros((1, 16, 16, 1)), jnp.zeros((1,))))

    flat_w = {jax.tree_util.keystr(p): l for p, l in
              jax.tree_util.tree_leaves_with_path(
                  jax.tree_util.tree_map(jnp.asarray, walk))}
    flat_s = {jax.tree_util.keystr(p): l for p, l in
              jax.tree_util.tree_leaves_with_path(struct)}
    assert set(flat_w) == set(flat_s)
    for k in flat_w:
        np.testing.assert_array_equal(np.asarray(flat_w[k]),
                                      np.asarray(flat_s[k]))
