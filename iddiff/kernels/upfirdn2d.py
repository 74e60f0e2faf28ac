"""upfirdn2d: fused upsample → FIR filter → downsample (StyleGAN2 resampling).

TPU-native equivalent of the reference CUDA kernel
(/root/reference/op/upfirdn2d_kernel.cu:49-368 + op/upfirdn2d.py:19-200).

Design note (why this is NOT a Pallas kernel): on TPU the whole
up-FIR-down pipeline is exactly one XLA `conv_general_dilated` —
lhs_dilation performs the zero-insertion upsample, the (possibly negative)
padding is native, window strides perform the downsample, and
feature_group_count=C makes it depthwise.  XLA lowers this to the native
TPU convolution path, fused end-to-end in one HBM pass; a hand-written
Pallas kernel would re-derive the same schedule.  The hand-written CUDA
backward (op/upfirdn2d.py:19-85, transposed filter + gradient padding) is
unnecessary: autodiff of conv_general_dilated produces exactly that
transposed convolution.

Layout: NHWC (TPU-native; the reference is NCHW).
`upfirdn2d_native` is a gather/pad reference implementation mirroring
op/upfirdn2d.py:159-200 for unit tests.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _parse2(v):
    if isinstance(v, (tuple, list)):
        return tuple(v)
    return (v, v)


def upfirdn2d(x: jax.Array, kernel: jax.Array, up=1, down=1, pad=(0, 0)):
    """x: (N, H, W, C); kernel: (kh, kw) FIR filter.

    Semantics identical to the reference wrapper (op/upfirdn2d.py:145-156):
    zero-insert upsample by `up`, pad by (pad[0], pad[1]) on both spatial
    dims, TRUE convolution with `kernel`, then stride-`down` decimation.
    """
    up_x, up_y = _parse2(up)
    down_x, down_y = _parse2(down)
    pad_x0, pad_x1 = pad if len(pad) == 2 else (pad[0], pad[1])

    n, h, w, c = x.shape
    kh, kw = kernel.shape
    # true convolution == cross-correlation with the flipped kernel
    k = jnp.flip(kernel, (0, 1)).astype(x.dtype)
    # depthwise filter: (kh, kw, 1, C) with feature_group_count=C (HWIO)
    k = jnp.tile(k[:, :, None, None], (1, 1, 1, c))
    # lhs_dilation inserts zeros BETWEEN samples only; zero-insertion
    # upsampling also appends (up-1) trailing zeros — fold them into the
    # right/bottom padding so shapes match the reference exactly.
    return lax.conv_general_dilated(
        x,
        k,
        window_strides=(down_y, down_x),
        padding=(
            (pad_x0, pad_x1 + up_y - 1),
            (pad_x0, pad_x1 + up_x - 1),
        ),
        lhs_dilation=(up_y, up_x),
        rhs_dilation=(1, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def upfirdn2d_native(x: jax.Array, kernel: jax.Array, up_x=1, up_y=1,
                     down_x=1, down_y=1, pad_x0=0, pad_x1=0, pad_y0=0,
                     pad_y1=0):
    """Pure pad/slice reference (mirrors op/upfirdn2d.py:159-200), NHWC."""
    n, in_h, in_w, c = x.shape
    kh, kw = kernel.shape
    # zero-insert upsample
    out = x.reshape(n, in_h, 1, in_w, 1, c)
    out = jnp.pad(out, [(0, 0), (0, 0), (0, up_y - 1), (0, 0), (0, up_x - 1), (0, 0)])
    out = out.reshape(n, in_h * up_y, in_w * up_x, c)
    # pad (negative = crop)
    out = jnp.pad(
        out,
        [(0, 0), (max(pad_y0, 0), max(pad_y1, 0)),
         (max(pad_x0, 0), max(pad_x1, 0)), (0, 0)],
    )
    out = out[
        :,
        max(-pad_y0, 0): out.shape[1] - max(-pad_y1, 0),
        max(-pad_x0, 0): out.shape[2] - max(-pad_x1, 0),
        :,
    ]
    # true convolution via explicit patch sum
    hh = out.shape[1] - kh + 1
    ww = out.shape[2] - kw + 1
    kflip = jnp.flip(kernel, (0, 1))
    acc = jnp.zeros((n, hh, ww, c), dtype=x.dtype)
    for i in range(kh):
        for j in range(kw):
            acc = acc + kflip[i, j] * out[:, i: i + hh, j: j + ww, :]
    return acc[:, ::down_y, ::down_x, :]


def upfirdn2d_pallas(x: jax.Array, kernel: jax.Array, up=1, down=1,
                     pad=(0, 0)):
    """Hand-written Pallas TPU kernel for the up-FIR-down pipeline.

    One VMEM pass per image: the padded (and zero-inserted) input tile is
    materialized in VMEM scratch, the small FIR kernel is unrolled into
    shifted multiply-accumulates on the VPU (channels ride the 128-lane
    axis), and decimation is a strided slice of the accumulator.

    Measured against the XLA `conv_general_dilated` formulation in
    bench-mode (see tests/test_kernels.py parity and RESULTS.md); the XLA
    path remains the default — this kernel exists for the cases where a
    fused single-pass beats the general conv and as the Pallas reference
    for the op (SURVEY.md §2.1 TPU plan).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    up_x, up_y = _parse2(up)
    down_x, down_y = _parse2(down)
    pad0, pad1 = pad
    n, h, w, c = x.shape
    kh, kw = kernel.shape
    kflip = jnp.flip(kernel, (0, 1)).astype(x.dtype)

    # zero-insertion buffer is h·up rows (incl. the up-1 trailing zeros);
    # over-allocate so the full out·down accumulation window is in-bounds
    in_h = h * up_y + pad0 + pad1
    in_w = w * up_x + pad0 + pad1
    out_h = (in_h - kh) // down_y + 1
    out_w = (in_w - kw) // down_x + 1
    buf_h = max(in_h, kh - 1 + out_h * down_y)
    buf_w = max(in_w, kw - 1 + out_w * down_x)
    assert pad0 >= 0 and pad1 >= 0, "pallas path: non-negative pads only"

    def kernel_fn(x_ref, k_ref, o_ref):
        def body(buf):
            # zero-inserted upsample + zero pad into VMEM scratch.
            # (concat/reshape interleaving: Mosaic has no scatter)
            buf[:] = jnp.zeros((buf_h, buf_w, c), x_ref.dtype)
            xx = x_ref[0]
            # zero-insertion via concat+reshape interleave (Mosaic has no
            # scatter).  NOTE: the up>1 interleave lowers in interpret mode
            # but currently fails Mosaic TC compilation — only the down
            # paths are production (see upfirdn2d_fused); tracked as a
            # lowering gap.
            if up_y > 1:
                xx = jnp.concatenate(
                    [xx[:, None], jnp.zeros((h, up_y - 1, w, c), xx.dtype)],
                    axis=1,
                ).reshape(h * up_y, w, c)
            if up_x > 1:
                hh = xx.shape[0]
                xx = jnp.concatenate(
                    [xx[:, :, None], jnp.zeros((hh, w, up_x - 1, c), xx.dtype)],
                    axis=2,
                ).reshape(hh, w * up_x, c)
            buf[pl.ds(pad0, h * up_y), pl.ds(pad0, w * up_x), :] = xx
            # unrolled FIR multiply-accumulate on the VPU
            acc = jnp.zeros((out_h * down_y, out_w * down_x, c), xx.dtype)
            for i in range(kh):
                for j in range(kw):
                    acc = acc + k_ref[i, j] * buf[
                        pl.ds(i, out_h * down_y), pl.ds(j, out_w * down_x), :
                    ]
            if down_y > 1 or down_x > 1:
                # decimate via reshape + unit slices (no strided gather)
                acc = acc.reshape(out_h, down_y, out_w, down_x, c)[
                    :, 0, :, 0, :
                ]
            o_ref[0] = acc

        pl.run_scoped(
            body, pltpu.VMEM((buf_h, buf_w, c), x.dtype)
        )

    out = pl.pallas_call(
        kernel_fn,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, out_h, out_w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, out_h, out_w, c), x.dtype),
    )(x, kflip)
    return out


def _polyphase_plan(up, p0, p1, kw, w):
    """Per-phase tap/offset plan for the polyphase up-FIR decomposition.

    For output phase r (out index y = q*up + r), only kernel taps
    i ≡ (p0 - r) (mod up) hit non-zero (inserted) samples; those taps read
    the ORIGINAL input at q + base_r + m — no zero-stuffed buffer needed,
    which is both the Mosaic-compilable formulation (the zero-insertion
    interleave fails TC lowering) and 1/up² of the MACs of the dilated conv.
    """
    out_len = up * w + p0 + p1 - kw + 1
    if out_len % up:
        return None
    phases = []
    for r in range(up):
        j0 = (p0 - r) % up
        m_taps = max(0, -(-(kw - j0) // up))  # ceil((kw - j0)/up)
        base = (r + j0 - p0) // up
        phases.append((j0, m_taps, base))
    left = max(0, -min(b for _, _, b in phases))
    q_len = out_len // up
    right = max(
        0,
        max(b + mt - 1 for _, mt, b in phases) + q_len - 1 - (w - 1),
    )
    return phases, left, right, q_len


def upfirdn2d_pallas_up(x: jax.Array, kernel: jax.Array, up=1, pad=(0, 0)):
    """Pallas TPU up-FIR (down=1) via polyphase decomposition.

    The kernel computes up_y·up_x phase outputs (each a small unrolled FIR
    over the un-dilated input in VMEM) into a phase-major buffer; the final
    interleave is a cheap XLA transpose+reshape outside.  Covers the
    reference CUDA up path (op/upfirdn2d_kernel.cu:49-368); parity-tested
    against `upfirdn2d` compiled (tests/test_kernels.py)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    up_x, up_y = _parse2(up)
    pad0, pad1 = pad
    n, h, w, c = x.shape
    kh, kw = kernel.shape
    kflip = jnp.flip(kernel, (0, 1)).astype(x.dtype)

    plan_y = _polyphase_plan(up_y, pad0, pad1, kh, h)
    plan_x = _polyphase_plan(up_x, pad0, pad1, kw, w)
    if plan_y is None or plan_x is None:
        raise ValueError("polyphase up-kernel needs up-divisible output dims")
    phases_y, ly, ry_, qh = plan_y
    phases_x, lx, rx_, qw = plan_x

    xpad = jnp.pad(x, ((0, 0), (ly, ry_), (lx, rx_), (0, 0)))
    hp, wp = xpad.shape[1], xpad.shape[2]

    def kernel_fn(x_ref, k_ref, o_ref):
        for ry in range(up_y):
            j0y, mty, by = phases_y[ry]
            for rx in range(up_x):
                j0x, mtx, bx = phases_x[rx]
                acc = jnp.zeros((qh, qw, c), x_ref.dtype)
                for my in range(mty):
                    for mx in range(mtx):
                        acc = acc + k_ref[j0y + my * up_y, j0x + mx * up_x] * \
                            x_ref[0, pl.ds(ly + by + my, qh),
                                  pl.ds(lx + bx + mx, qw), :]
                o_ref[0, ry, rx] = acc

    out = pl.pallas_call(
        kernel_fn,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, hp, wp, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, up_y, up_x, qh, qw, c), lambda i: (i, 0, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, up_y, up_x, qh, qw, c), x.dtype),
    )(xpad, kflip)
    # interleave phases: (n, ry, rx, qh, qw, c) -> (n, qh, ry, qw, rx, c)
    out = out.transpose(0, 3, 1, 4, 2, 5)
    return out.reshape(n, qh * up_y, qw * up_x, c)


from functools import partial


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def upfirdn2d_fused(x, kernel, up=1, down=1, pad=(0, 0)):
    """Production upfirdn2d: Pallas forward on TPU for the down paths
    (measured 1.4-2.3x faster than the XLA conv on v5e for NCSN++ FIR
    shapes), XLA everywhere else; backward is the XLA formulation's VJP
    (mathematically identical forward ⇒ identical gradient)."""
    up_x, up_y = _parse2(up)
    if (
        jax.devices()[0].platform == "tpu"
        and up_x == 1 and up_y == 1
        and min(pad) >= 0
    ):
        return upfirdn2d_pallas(x, kernel, up=up, down=down, pad=pad)
    return upfirdn2d(x, kernel, up=up, down=down, pad=pad)


def _fused_fwd(x, kernel, up, down, pad):
    return upfirdn2d_fused(x, kernel, up, down, pad), (x, kernel)


def _fused_bwd(up, down, pad, res, g):
    x, kernel = res
    _, vjp = jax.vjp(lambda xx, kk: upfirdn2d(xx, kk, up=up, down=down,
                                              pad=pad), x, kernel)
    return vjp(g)


upfirdn2d_fused.defvjp(_fused_fwd, _fused_bwd)


def _setup_kernel(k) -> jax.Array:
    k = jnp.asarray(k, dtype=jnp.float32)
    if k.ndim == 1:
        k = jnp.outer(k, k)
    return k / jnp.sum(k)


def _pallas_up_viable(x, kernel, up, pad) -> bool:
    """Polyphase Pallas up-kernel applicability: TPU, non-negative pads,
    up-divisible output dims, and the per-image blocks fit VMEM (~16 MB;
    we budget 8 MB for in+out+accumulator)."""
    if jax.devices()[0].platform != "tpu":
        return False
    if min(pad) < 0:
        return False
    up_x, up_y = _parse2(up)
    if up_x == 1 and up_y == 1:
        return False
    n, h, w, c = x.shape
    kh, kw = kernel.shape
    if _polyphase_plan(up_y, pad[0], pad[1], kh, h) is None:
        return False
    if _polyphase_plan(up_x, pad[0], pad[1], kw, w) is None:
        return False
    bytes_in = (h + kh) * (w + kw) * c * x.dtype.itemsize
    bytes_out = up_y * up_x * h * w * c * x.dtype.itemsize
    return bytes_in + 2 * bytes_out < 8 * 1024 * 1024


def upsample_2d(x, k=None, factor=2, gain=1):
    """FIR upsample (models/up_or_down_sampling.py:140-174 semantics), NHWC.

    Dispatch: XLA dilated depthwise conv by default; the polyphase Pallas
    kernel (upfirdn2d_pallas_up) covers the up path where measured faster
    (see RESULTS.md round-2 up-path measurements)."""
    if k is None:
        k = [1] * factor
    k = _setup_kernel(k) * (gain * (factor**2))
    p = k.shape[0] - factor
    pad = ((p + 1) // 2 + factor - 1, p // 2)
    if _PALLAS_UP_DEFAULT and _pallas_up_viable(x, k, factor, pad):
        return upfirdn2d_pallas_up(x, k, up=factor, pad=pad)
    return upfirdn2d(x, k, up=factor, pad=pad)


# flipped by the round-2 measurement (RESULTS.md): True when the polyphase
# Pallas up-kernel beats the XLA dilated conv on NCSN++ shapes
_PALLAS_UP_DEFAULT = False


def downsample_2d(x, k=None, factor=2, gain=1):
    """FIR downsample (models/up_or_down_sampling.py:223-256 semantics), NHWC.

    Uses the fused Pallas forward on TPU (upfirdn2d_fused)."""
    if k is None:
        k = [1] * factor
    k = _setup_kernel(k) * gain
    p = k.shape[0] - factor
    return upfirdn2d_fused(x, k, 1, factor, ((p + 1) // 2, p // 2))


def conv_downsample_blur(x, k=None, factor=2, gain=1, conv_size=3):
    """FIR pre-blur for the reference's fused conv+downsample
    (conv_downsample_2d, models/up_or_down_sampling.py:141-177), NHWC.

    The reference op is mathematically conv2d-then-FIR-downsample, computed
    as one full-resolution FIR pass followed by a strided VALID conv; this
    returns the padded/blurred tensor so the caller's
    `Conv(strides=factor, padding='VALID')` reproduces it exactly
    (incl. borders — padding happens ONCE here, not per-op)."""
    if k is None:
        k = [1] * factor
    k = _setup_kernel(k) * gain
    p = (k.shape[0] - factor) + (conv_size - 1)
    return upfirdn2d_fused(x, k, 1, 1, ((p + 1) // 2, p // 2))
