"""Cross-framework parity: iddiff kernels vs the REFERENCE's own torch ops.

The reference's pure-torch fallbacks (`op/upfirdn2d.py::upfirdn2d_native`,
`op/fused_act.py::fused_leaky_relu` CPU branch) are the ground truth the
CUDA kernels are tested against upstream.  Here we run those literal
function bodies (extracted by AST so the module-level CUDA `load()` never
executes) against the iddiff JAX kernels on identical inputs — the
strongest parity evidence available without a GPU.

Skipped when /root/reference or torch is absent.
"""
import ast
import os

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "op")),
    reason="reference repo not available",
)


def _extract_function(path: str, name: str, namespace: dict):
    """Exec only the named top-level def from `path` (the reference file
    imports a CUDA extension at module level, which cannot load here)."""
    with open(path) as f:
        tree = ast.parse(f.read())
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name == name:
            code = compile(ast.Module(body=[node], type_ignores=[]),
                           path, "exec")
            exec(code, namespace)
            return namespace[name]
    raise AssertionError(f"{name} not found in {path}")


@pytest.fixture(scope="module")
def ref_upfirdn2d_native():
    ns = {"torch": torch, "F": torch.nn.functional}
    return _extract_function(
        os.path.join(REF, "op", "upfirdn2d.py"), "upfirdn2d_native", ns)


@pytest.fixture(scope="module")
def ref_fused_leaky_relu():
    ns = {"torch": torch, "F": torch.nn.functional}
    return _extract_function(
        os.path.join(REF, "op", "fused_act.py"), "fused_leaky_relu", ns)


@pytest.mark.parametrize(
    "up,down,pad,kshape",
    [
        (1, 1, (1, 1), (3, 3)),
        (2, 1, (2, 1), (4, 4)),
        (1, 2, (1, 1), (4, 4)),
        (2, 2, (1, 1), (3, 3)),
        (1, 1, (0, 0), (1, 1)),
    ],
)
def test_upfirdn2d_matches_reference_torch(ref_upfirdn2d_native,
                                           up, down, pad, kshape):
    """iddiff upfirdn2d (XLA conv path, NHWC) == reference upfirdn2d_native
    (torch, NCHW) on identical inputs (reference op/upfirdn2d.py:159-202)."""
    from iddiff.kernels import upfirdn2d

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, 8, 8)).astype(np.float32)  # NCHW
    k = rng.normal(size=kshape).astype(np.float32)

    want = ref_upfirdn2d_native(
        torch.from_numpy(x), torch.from_numpy(k),
        up_x=up, up_y=up, down_x=down, down_y=down,
        pad_x0=pad[0], pad_x1=pad[1], pad_y0=pad[0], pad_y1=pad[1],
    ).numpy()  # NCHW in, NCHW out (op/upfirdn2d.py:159-202)

    got = upfirdn2d(
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),  # NHWC
        jnp.asarray(k), up=up, down=down, pad=pad,
    )
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_fused_leaky_relu_matches_reference_torch(ref_fused_leaky_relu):
    """iddiff fused_leaky_relu == the reference's CPU branch
    (op/fused_act.py:86-97): (x + bias) -> leaky_relu(0.2) -> * sqrt(2)."""
    from iddiff.kernels import fused_leaky_relu

    rng = np.random.default_rng(1)
    x = rng.normal(size=(4, 16, 8, 8)).astype(np.float32)  # NCHW
    b = rng.normal(size=(16,)).astype(np.float32)

    want = ref_fused_leaky_relu(
        torch.from_numpy(x), torch.from_numpy(b)).numpy()

    got = fused_leaky_relu(
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))), jnp.asarray(b))
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_upsample_downsample_roundtrip_matches_reference(
        ref_upfirdn2d_native):
    """upsample_2d/downsample_2d use the reference's FIR pad arithmetic
    (op/upfirdn2d.py + model usage): cross-check against the torch native
    op with the same (1,3,3,1) kernel and factor-2 padding scheme."""
    from iddiff.kernels import upsample_2d
    from iddiff.kernels.upfirdn2d import _setup_kernel

    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 2, 6, 6)).astype(np.float32)  # NCHW
    k1 = np.asarray([1.0, 3.0, 3.0, 1.0], np.float32)
    k = np.asarray(_setup_kernel(jnp.asarray(k1)))
    factor = 2
    kk = k * (factor ** 2)
    p = kk.shape[0] - factor
    pad = ((p + 1) // 2 + factor - 1, p // 2)

    want = ref_upfirdn2d_native(
        torch.from_numpy(x), torch.from_numpy(kk),
        up_x=factor, up_y=factor, down_x=1, down_y=1,
        pad_x0=pad[0], pad_x1=pad[1], pad_y0=pad[0], pad_y1=pad[1],
    ).numpy()

    got = upsample_2d(
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))), k=list(k1), factor=2)
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.fixture(scope="module")
def ref_up_or_down_sampling(ref_upfirdn2d_native):
    """Exec the reference's up_or_down_sampling.py with upfirdn2d bound to
    the torch-native fallback (the module-level `from op import upfirdn2d`
    would JIT-compile CUDA)."""
    import ast as _ast

    def _upfirdn(input, kernel, up=1, down=1, pad=(0, 0)):
        return ref_upfirdn2d_native(
            input, kernel, up, up, down, down, pad[0], pad[1], pad[0], pad[1])

    path = os.path.join(REF, "models", "up_or_down_sampling.py")
    with open(path) as f:
        src = f.read()
    ns = {"torch": torch, "F": torch.nn.functional, "np": np,
          "upfirdn2d": _upfirdn, "nn": torch.nn}
    tree = _ast.parse(src)
    keep = [n for n in tree.body
            if isinstance(n, (_ast.FunctionDef, _ast.ClassDef))]
    exec(compile(_ast.Module(body=keep, type_ignores=[]), path, "exec"), ns)
    return ns


def test_fir_conv_downsample_matches_reference(ref_up_or_down_sampling):
    """Downsample(fir=True, with_conv=True) == the reference's LIVE fused
    conv_downsample_2d (up_or_down_sampling.py:141-177): conv2d THEN
    FIR-downsample, padding applied once. (The fused UP path,
    upsample_conv_2d, cannot execute in torch at all — negative-step
    slicing at up_or_down_sampling.py:126 plus a 4-element conv_transpose2d
    stride — so iddiff's Upsample keeps the docstring semantics
    'upsample_2d then conv', which matches the fused op in the interior.)"""
    import jax
    from iddiff.nn import Downsample

    conv_downsample_2d = ref_up_or_down_sampling["conv_downsample_2d"]
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 3, 8, 8)).astype(np.float32)  # NCHW
    w = rng.normal(size=(5, 3, 3, 3)).astype(np.float32)  # OIHW
    k = (1, 3, 3, 1)

    want = conv_downsample_2d(
        torch.from_numpy(x), torch.from_numpy(w), k=list(k)).numpy()

    layer = Downsample(with_conv=True, fir=True, fir_kernel=k, out_ch=5)
    params = layer.init(
        jax.random.PRNGKey(0),
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))))["params"]
    # install the torch weights: OIHW -> HWIO, zero bias (the reference
    # functional op has no bias)
    params = dict(params)
    params["Conv_0"] = {
        "kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
        "bias": jnp.zeros((5,), jnp.float32),
    }
    got = layer.apply({"params": params},
                      jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
