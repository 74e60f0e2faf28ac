"""2-D vector-field curl utilities (finite-difference + autodiff).

Rebuild of /root/reference/vector_fields/vector_utils.py:36-41 and
utils.py's compute_curl: curl v = ∂_x v_y − ∂_y v_x, either from a sampled
grid (np.gradient) or exactly via jax.jacfwd of the field.
"""
from __future__ import annotations

import numpy as np


def curl_fd(field_x: np.ndarray, field_y: np.ndarray, dx: float) -> np.ndarray:
    """Finite-difference curl on a grid (vector_utils.py:36-41)."""
    dvy_dx = np.gradient(field_y, dx, axis=1)
    dvx_dy = np.gradient(field_x, dx, axis=0)
    return dvy_dx - dvx_dy


def curl_autograd(field_fn, points):
    """Exact curl of field_fn: (N,2)->(N,2) at points via one jacfwd."""
    import jax

    def one(p):
        jac = jax.jacfwd(lambda q: field_fn(q[None])[0])(p)
        return jac[1, 0] - jac[0, 1]

    return jax.vmap(one)(points)


def extract_vector_field(score_fn, xs, ys, t: float):
    """Evaluate a score field on a meshgrid (utils.py extract_vector_field)."""
    import jax.numpy as jnp

    pts = np.stack([xs.reshape(-1), ys.reshape(-1)], axis=1).astype(np.float32)
    tvec = jnp.full((len(pts),), t, dtype=jnp.float32)
    out = np.asarray(score_fn(jnp.asarray(pts), tvec))
    return out[:, 0].reshape(xs.shape), out[:, 1].reshape(ys.shape)
