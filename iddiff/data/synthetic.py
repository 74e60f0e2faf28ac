"""Synthetic image/2-D manifolds with known intrinsic dimension.

Rebuild of /root/reference/lightning_data_modules/SyntheticDataset.py:20-429.
The reference paints squares/gaussians pixel-by-pixel in Python loops; here
each family is a closed-form vectorized numpy computation:

  - SquaresManifold        random square positions per sample (:47-79)
  - FixedSquaresManifold   fixed squares, random intensity each ⇒ ID=K (:81-123)
                           (one (N,K) @ (K,HW) matmul)
  - FixedGaussiansManifold fixed centers, random σ each ⇒ ID=K (:125-183)
  - GaussianBubbles        2-D GMM on the unit circle with ANALYTIC smoothed
                           log_prob and ground-truth score (:185-302) — the
                           Fisher-divergence oracle
  - Circles                two noisy radii (:304-376)

Images are NHWC (TPU-native), shape (N, H, W, 1).
"""
from __future__ import annotations

import numpy as np

from .datamodule import ArrayDataModule
from .registry import register_datamodule


def _square_masks(centers_x, centers_y, sides, img_size):
    """Boolean masks (..., H, W) of squares given centers/sides (...,)."""
    x0 = centers_x - ((sides + 1) // 2 - 1)
    y0 = centers_y - ((sides + 1) // 2 - 1)
    rows = np.arange(img_size)
    r = rows.reshape((1,) * x0.ndim + (img_size,))
    mx = (r >= x0[..., None]) & (r < (x0 + sides)[..., None])  # (..., H)
    my = (r >= y0[..., None]) & (r < (y0 + sides)[..., None])  # (..., W)
    return mx, my


def generate_squares(n_samples, num_squares, square_range, img_size, seed,
                     chunk=512):
    """Random square positions per sample (SquaresManifold, :51-79)."""
    rng = np.random.default_rng(seed)
    square_range = np.asarray(square_range)
    out = np.zeros((n_samples, img_size, img_size), dtype=np.float32)
    for s0 in range(0, n_samples, chunk):
        c = min(chunk, n_samples - s0)
        sides = rng.choice(square_range, size=(c, num_squares))
        start = (sides + 1) // 2
        finish = img_size - (sides + 1) // 2
        cx = start + (rng.random((c, num_squares)) * (finish - start)).astype(int)
        cy = start + (rng.random((c, num_squares)) * (finish - start)).astype(int)
        mx, my = _square_masks(cx, cy, sides, img_size)
        out[s0: s0 + c] = np.einsum(
            "ckh,ckw->chw", mx.astype(np.float32), my.astype(np.float32)
        )
    return out[..., None]


def generate_fixed_squares(n_samples, num_squares, square_range, img_size, seed):
    """Fixed squares, one random intensity per square per sample ⇒ ID = num_squares
    (FixedSquaresManifold, :98-123).  data = C @ M, a single MXU-friendly matmul."""
    rng = np.random.default_rng(seed)
    square_range = np.asarray(square_range)
    sides = rng.choice(square_range, size=(num_squares,))
    start = (sides + 1) // 2
    finish = img_size - (sides + 1) // 2
    cx = start + (rng.random(num_squares) * (finish - start)).astype(int)
    cy = start + (rng.random(num_squares) * (finish - start)).astype(int)
    mx, my = _square_masks(cx, cy, sides, img_size)  # (K,H), (K,W)
    masks = (mx[:, :, None] & my[:, None, :]).astype(np.float32)  # (K,H,W)
    coeffs = rng.random((n_samples, num_squares)).astype(np.float32)
    data = coeffs @ masks.reshape(num_squares, -1)
    return data.reshape(n_samples, img_size, img_size, 1)


def generate_fixed_gaussians(n_samples, num_gaussians, std_range, img_size, seed,
                             chunk=256):
    """Fixed centers, one random σ per blob per sample ⇒ ID = num_gaussians
    (FixedGaussiansManifold, :142-183), min-max normalized per image."""
    rng = np.random.default_rng(seed)
    # centers sampled without replacement from the pixel grid (:129-140)
    flat = rng.choice(img_size * img_size, size=num_gaussians, replace=False)
    cx, cy = flat // img_size, flat % img_size
    xx, yy = np.meshgrid(np.arange(img_size), np.arange(img_size), indexing="ij")
    dist2 = (xx[None] - cx[:, None, None]) ** 2 + (yy[None] - cy[:, None, None]) ** 2
    dist2 = dist2.astype(np.float32)  # (K,H,W)

    out = np.zeros((n_samples, img_size, img_size), dtype=np.float32)
    for s0 in range(0, n_samples, chunk):
        c = min(chunk, n_samples - s0)
        stds = rng.uniform(std_range[0], std_range[1], size=(c, num_gaussians, 1, 1))
        amp = 1.0 / (np.sqrt(2 * np.pi) * stds)
        img = (amp * np.exp(-dist2[None] / (2 * stds**2))).sum(axis=1)
        mn = img.min(axis=(1, 2), keepdims=True)
        mx = img.max(axis=(1, 2), keepdims=True)
        out[s0: s0 + c] = (img - mn) / (mx - mn)
    return out[..., None]


def fixed_squares_constants(num_squares, square_range, img_size, seed):
    """The manifold-defining constants of FixedSquaresManifold: draws them
    with the SAME seeded numpy calls (same order) as generate_fixed_squares,
    so the manifold (mask layout) is identical whether samples are produced
    on host or on device.  Returns masks (K, H*W) float32."""
    rng = np.random.default_rng(seed)
    square_range = np.asarray(square_range)
    sides = rng.choice(square_range, size=(num_squares,))
    start = (sides + 1) // 2
    finish = img_size - (sides + 1) // 2
    cx = start + (rng.random(num_squares) * (finish - start)).astype(int)
    cy = start + (rng.random(num_squares) * (finish - start)).astype(int)
    mx, my = _square_masks(cx, cy, sides, img_size)
    return (mx[:, :, None] & my[:, None, :]).astype(np.float32).reshape(
        num_squares, -1)


def fixed_gaussians_constants(num_gaussians, img_size, seed):
    """Fixed blob centers of FixedGaussiansManifold (same seeded draw as
    generate_fixed_gaussians).  Returns dist2 (K, H, W) float32."""
    rng = np.random.default_rng(seed)
    flat = rng.choice(img_size * img_size, size=num_gaussians, replace=False)
    cx, cy = flat // img_size, flat % img_size
    xx, yy = np.meshgrid(np.arange(img_size), np.arange(img_size), indexing="ij")
    dist2 = (xx[None] - cx[:, None, None]) ** 2 + (yy[None] - cy[:, None, None]) ** 2
    return dist2.astype(np.float32)


def bubble_centers(num_mixtures: int) -> np.ndarray:
    """Mixture centers evenly spaced on the unit circle (:210-221)."""
    if num_mixtures == 1:
        return np.zeros((1, 2))
    theta = 2 * np.pi * np.arange(num_mixtures) / num_mixtures
    return np.stack([np.cos(theta), np.sin(theta)], axis=1)


def generate_gaussian_bubbles(n_samples, mixtures, std, seed):
    rng = np.random.default_rng(seed)
    centers = bubble_centers(mixtures)
    idx = rng.integers(0, mixtures, size=n_samples)
    data = centers[idx] + std * rng.normal(size=(n_samples, 2))
    return data.astype(np.float32), idx


def generate_circles(n_samples, noise, seed):
    rng = np.random.default_rng(seed)
    mus = np.array([0.5, 1.0])
    r = mus[rng.integers(0, 2, size=n_samples)] + noise * rng.normal(size=n_samples)
    theta = rng.uniform(0, 2 * np.pi, size=n_samples)
    return np.stack([r * np.cos(theta), r * np.sin(theta)], axis=1).astype(np.float32)


@register_datamodule(name="Synthetic")
class SyntheticDataModule(ArrayDataModule):
    """Dispatch on config.data.dataset_type (:405-417)."""

    def generate(self, config):
        d = config.data
        seed = int(config.get("seed", 42))
        kind = d.dataset_type
        if kind == "GaussianBubbles":
            data, labels = generate_gaussian_bubbles(
                d.data_samples, d.mixtures, d.std, seed
            )
            self.mixtures, self.std = d.mixtures, d.std
            self.centers = bubble_centers(d.mixtures)
            return data, labels
        if kind == "Circles":
            return generate_circles(d.data_samples, d.noise, seed)
        if kind == "SquaresManifold":
            return generate_squares(
                d.data_samples, d.num_squares, list(d.square_range),
                d.image_size, seed,
            )
        if kind == "FixedSquaresManifold":
            return generate_fixed_squares(
                d.data_samples, d.num_squares, list(d.square_range),
                d.image_size, seed,
            )
        if kind == "FixedGaussiansManifold":
            return generate_fixed_gaussians(
                d.data_samples, d.num_gaussians, list(d.std_range),
                d.image_size, seed,
            )
        raise NotImplementedError(f"Unknown synthetic dataset_type '{kind}'")

    # --- on-device virtual dataset (TPU-native fast path) --------------------
    # The fixed-* manifolds are procedural: the manifold is defined by a few
    # host constants (mask layout / blob centers, drawn from the config seed)
    # and each sample by K per-sample uniforms.  `device_generator` returns a
    # jittable gen(indices) that synthesizes sample i from
    # fold_in(key, i) entirely on device — a FIXED virtual dataset (same
    # index → same image, forever) with ZERO host→device batch traffic.
    # The per-sample RNG realization differs from the numpy host dataset
    # (documented in PARITY.md); the manifold constants are identical.
    def supports_device_generation(self) -> bool:
        return self.config.data.dataset_type in (
            "FixedSquaresManifold", "FixedGaussiansManifold")

    def device_generator(self):
        import jax
        import jax.numpy as jnp

        d = self.config.data
        img = int(d.image_size)
        # decouple the sample stream from other consumers of the run seed
        base = jax.random.fold_in(jax.random.PRNGKey(self.seed), 0x1DD1FF)
        if d.dataset_type == "FixedSquaresManifold":
            masks = jnp.asarray(fixed_squares_constants(
                d.num_squares, list(d.square_range), img, self.seed))

            def sample_one(idx):
                key = jax.random.fold_in(base, idx)
                coeffs = jax.random.uniform(key, (masks.shape[0],))
                return (coeffs @ masks).reshape(img, img, 1)

        elif d.dataset_type == "FixedGaussiansManifold":
            dist2 = jnp.asarray(fixed_gaussians_constants(
                d.num_gaussians, img, self.seed))
            s0, s1 = (float(v) for v in d.std_range)

            def sample_one(idx):
                key = jax.random.fold_in(base, idx)
                stds = jax.random.uniform(
                    key, (dist2.shape[0], 1, 1), minval=s0, maxval=s1)
                amp = 1.0 / (jnp.sqrt(2 * jnp.pi) * stds)
                im = (amp * jnp.exp(-dist2 / (2 * stds**2))).sum(axis=0)
                mn, mx = im.min(), im.max()
                return ((im - mn) / (mx - mn))[..., None]

        else:
            raise NotImplementedError(
                f"on_device_generation unsupported for {d.dataset_type!r}")
        return jax.vmap(sample_one)

    # --- analytic oracle for GaussianBubbles (:266-302) ----------------------
    def log_prob(self, xs, ts, sde):
        """Smoothed GMM log-density log p_t(x) under a VE perturbation."""
        import jax.numpy as jnp

        mus = jnp.asarray(self.centers, dtype=xs.dtype)  # (K,2)
        sigma_t = sde.marginal_prob(jnp.zeros_like(ts), ts)[1]
        sig2 = self.std**2 + sigma_t**2  # (N,)
        d2 = jnp.sum((xs[:, None, :] - mus[None]) ** 2, axis=2)  # (N,K)
        dens = jnp.exp(-d2 / (2 * sig2[:, None])) / (2 * jnp.pi * sig2[:, None])
        return jnp.log(jnp.mean(dens, axis=1))

    def ground_truth_score(self, xs, ts, sde):
        """∇_x log p_t(x) via autodiff of the analytic log_prob (:30-35)."""
        import jax

        def lp_sum(x):
            return self.log_prob(x, ts, sde).sum()

        return jax.grad(lp_sum)(xs)
