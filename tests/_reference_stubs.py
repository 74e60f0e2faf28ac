"""Shared scaffolding for the cross-framework parity tests.

The reference repo's modules import packages absent from this image
(pytorch_lightning, torchvision) or JIT-compile CUDA at import time (op/);
the installers below stub exactly what the literal reference code touches.
The stub score nets exist in matched torch/flax pairs so both frameworks'
adapters can be compared on identical math.
"""
import ast
import os
import sys
import types

import numpy as np

REF = "/root/reference"


def install_pl_stub(torch):
    """pytorch_lightning.LightningModule -> torch.nn.Module."""
    if "pytorch_lightning" not in sys.modules:
        pl_stub = types.ModuleType("pytorch_lightning")
        pl_stub.LightningModule = torch.nn.Module
        sys.modules["pytorch_lightning"] = pl_stub


def install_torchvision_stub():
    """Just enough torchvision surface for models/ddpm.py's imports."""
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        transforms = types.ModuleType("torchvision.transforms")
        functional = types.ModuleType("torchvision.transforms.functional")
        functional.InterpolationMode = object
        transforms.Resize = object
        transforms.functional = functional
        tv.transforms = transforms
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = transforms
        sys.modules["torchvision.transforms.functional"] = functional


def extract_function(path, name, namespace):
    """Exec only the named top-level def from `path` (module-level CUDA
    load() prevents a plain import)."""
    with open(path) as f:
        tree = ast.parse(f.read())
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name == name:
            exec(compile(ast.Module(body=[node], type_ignores=[]),
                         path, "exec"), namespace)
            return namespace[name]
    raise AssertionError(f"{name} not found in {path}")


def install_op_stub(torch):
    """Stub the CUDA 'op' package with the torch-native upfirdn2d fallback
    so up_or_down_sampling.py imports."""
    if "op" in sys.modules:
        return
    ns = {"torch": torch, "F": torch.nn.functional}
    native = extract_function(
        os.path.join(REF, "op", "upfirdn2d.py"), "upfirdn2d_native", ns)

    def _upfirdn(input, kernel, up=1, down=1, pad=(0, 0)):
        return native(input, kernel, up, up, down, down,
                      pad[0], pad[1], pad[0], pad[1])

    op_stub = types.ModuleType("op")
    op_stub.upfirdn2d = _upfirdn
    sys.modules["op"] = op_stub


def make_torch_stub(torch, w):
    """torch stub net: out = w * x + 0.01 * labels[:, None]."""

    class TorchStub(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.w = torch.nn.Parameter(torch.from_numpy(w))

        def forward(self, x, labels):
            return x * self.w + 0.01 * labels[:, None]

    return TorchStub()


def make_flax_stub(w):
    """flax twin of make_torch_stub; returns (model, params)."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    class FlaxStub(nn.Module):
        @nn.compact
        def __call__(self, x, labels, train=False):
            ww = self.param("w", lambda k: jnp.asarray(w))
            return x * ww + 0.01 * labels[:, None]

    model = FlaxStub()
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, w.shape[0])), jnp.zeros((1,))
    )["params"]
    return model, params


def make_data(seed=0, n=5, d=4, grid_safe_t=False, n_grid=799):
    """(w, x, t, z) test tensors; grid_safe_t keeps t strictly inside
    discretization cells so torch .long() and jnp int32 casts agree."""
    rng = np.random.default_rng(seed)
    w = rng.normal(size=(d,)).astype(np.float32)
    x = rng.normal(size=(n, d)).astype(np.float32)
    if grid_safe_t:
        t = (rng.integers(5, 700, size=(n,)) + 0.37).astype(np.float32) / n_grid
    else:
        t = rng.uniform(1e-3, 1.0, size=(n,)).astype(np.float32)
    z = rng.normal(size=(n, d)).astype(np.float32)
    return w, x, t, z


def make_sde_pair(name, ref_sde_lib):
    """Matching (reference, iddiff) SDE instances."""
    from iddiff.sde import VESDE, VPSDE

    if name == "vesde":
        return (ref_sde_lib.VESDE(sigma_min=0.02, sigma_max=20.0, N=800),
                VESDE(sigma_min=0.02, sigma_max=20.0, N=800))
    return (ref_sde_lib.VPSDE(beta_min=0.1, beta_max=20.0, N=800),
            VPSDE(beta_min=0.1, beta_max=20.0, N=800))
