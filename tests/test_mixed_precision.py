"""bf16 compute path: numerics close to fp32, grads flow to fp32 masters."""
import jax
import jax.numpy as jnp
import ml_collections
import numpy as np

from iddiff.losses import get_sde_loss_fn
from iddiff.models import create_model, get_score_fn
from iddiff.sde import VESDE


def _config(compute_dtype=None):
    c = ml_collections.ConfigDict()
    c.model = ml_collections.ConfigDict(dict(
        name="fcn", state_size=8, hidden_layers=2, hidden_nodes=64,
        dropout=0.0,
    ))
    if compute_dtype:
        c.model.compute_dtype = compute_dtype
    return c


def test_bf16_matches_fp32_closely():
    x = jax.random.normal(jax.random.PRNGKey(0), (16, 8))
    t = jnp.full((16,), 0.5)
    m32 = create_model(_config())
    params = m32.init(jax.random.PRNGKey(1), x, t)["params"]
    sde = VESDE(sigma_min=0.01, sigma_max=4.0)
    s32 = get_score_fn(sde, m32, params)(x, t)

    m16 = create_model(_config("bfloat16"))
    s16 = get_score_fn(sde, m16, params)(x, t)
    assert s16.dtype == jnp.float32  # cast back at the boundary
    rel = np.abs(np.asarray(s16 - s32)) / (np.abs(np.asarray(s32)) + 1e-3)
    assert np.median(rel) < 0.05, np.median(rel)


def test_bf16_training_step_grads_fp32():
    import optax

    m16 = create_model(_config("bfloat16"))
    x = jax.random.normal(jax.random.PRNGKey(0), (32, 8))
    params = m16.init(jax.random.PRNGKey(1), x, jnp.zeros((32,)))["params"]
    sde = VESDE(sigma_min=0.01, sigma_max=4.0)
    loss_fn = get_sde_loss_fn(sde, m16, train=True, eps=1e-5)
    loss, grads = jax.value_and_grad(loss_fn)(params, x, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))
    for g in jax.tree_util.tree_leaves(grads):
        assert g.dtype == jnp.float32  # master grads stay fp32
    assert float(optax.global_norm(grads)) > 0
