"""On-device virtual dataset generation + scan-fused training blocks.

The fixed synthetic manifolds (FixedSquaresManifold/FixedGaussiansManifold,
/root/reference/lightning_data_modules/SyntheticDataset.py:81-183) are
procedural, so the TPU-native fast path synthesizes batches ON DEVICE from
index-keyed PRNG (iddiff/data/synthetic.py device_generator) and fuses
log_freq train steps into one lax.scan dispatch (make_train_block).  These
tests pin:

  - manifold-constant parity between host numpy and device generators
  - per-index determinism of the virtual dataset
  - bit-equality of the scan-fused block with the per-step path
  - weight-0 row skipping (ragged tails / budget stop)
  - a full Trainer.fit e2e in virtual mode on the fake 8-device mesh
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from iddiff.data.registry import create_datamodule
from iddiff.data.synthetic import (
    fixed_gaussians_constants,
    fixed_squares_constants,
    generate_fixed_gaussians,
    generate_fixed_squares,
)
from iddiff.configs.dimension_estimation.squares import squares_config
from iddiff.parallel import make_mesh, replicate, shard_batch
from iddiff.training import TrainState, Trainer, make_train_step
from iddiff.training.train_step import make_train_block


def _tiny_config(kind="blobs", **overrides):
    c = squares_config(3, kind=kind)
    c.data.data_samples = 96
    c.data.on_device_generation = True
    c.training.batch_size = 16
    c.validation.batch_size = 16
    c.eval.batch_size = 16
    c.training.num_epochs = 2
    c.training.n_iters = 10_000
    c.training.log_freq = 4
    c.model.nf = 8
    c.model.ch_mult = [1, 2]
    c.model.num_res_blocks = 1
    c.model.attn_resolutions = []
    c.optim.warmup = 10
    c.logging.svd_frequency = 0
    c.logging.top_k = 1
    c.logging.every_n_epochs = None
    for k, v in overrides.items():
        c.update_from_flattened_dict({k: v})
    return c


# --------------------------------------------------------------------------
# generator parity with the host numpy dataset
# --------------------------------------------------------------------------

def test_squares_constants_match_host_generator():
    """Host samples lie exactly in the span of the constants' masks, and the
    sample mean converges to 0.5 * sum(masks) (coeffs ~ U[0,1))."""
    K, rng_, img, seed = 4, [3, 5], 16, 11
    masks = fixed_squares_constants(K, rng_, img, seed)  # (K, HW)
    host = generate_fixed_squares(4096, K, rng_, img, seed).reshape(4096, -1)
    coeffs, res, *_ = np.linalg.lstsq(masks.T, host.T, rcond=None)
    assert res.size == 0 or np.allclose(res, 0, atol=1e-6)
    np.testing.assert_allclose(
        host.mean(axis=0), 0.5 * masks.sum(axis=0), atol=0.02)


def test_gaussians_constants_match_host_generator():
    """With a degenerate std_range the per-sample randomness vanishes, so
    host and device samples must agree pixel-for-pixel."""
    K, img, seed = 3, 16, 7
    host = generate_fixed_gaussians(2, K, [2.0, 2.0], img, seed)
    cfg = _tiny_config()
    cfg.data.num_gaussians = K
    cfg.data.std_range = [2.0, 2.0]
    cfg.data.image_size = img
    cfg.data.shape = [img, img, 1]
    cfg.seed = seed
    dm = create_datamodule(cfg)
    dm.setup()
    dev = np.asarray(dm.device_generator()(jnp.arange(2, dtype=jnp.int32)))
    np.testing.assert_allclose(dev, host, atol=1e-5)


def test_device_gen_deterministic_by_index():
    cfg = _tiny_config()
    dm = create_datamodule(cfg)
    dm.setup()
    gen = dm.device_generator()
    a = np.asarray(gen(jnp.asarray([5, 9], jnp.int32)))
    b = np.asarray(gen(jnp.asarray([5, 9], jnp.int32)))
    np.testing.assert_array_equal(a, b)
    c = np.asarray(gen(jnp.asarray([6, 9], jnp.int32)))
    assert not np.allclose(a[0], c[0])
    np.testing.assert_array_equal(a[1], c[1])


def test_virtual_accessors():
    cfg = _tiny_config()
    dm = create_datamodule(cfg)
    dm.setup()
    assert dm.virtual and dm.train_data is None
    assert dm.data_shape == (32, 32, 1)
    head = dm.train_head(3)
    assert head.shape == (3, 32, 32, 1)
    pts = dm.train_datapoints(4, seed=0)
    pts2 = dm.train_datapoints(4, seed=0)
    np.testing.assert_array_equal(pts, pts2)
    # index split partitions the virtual index space disjointly
    all_idx = np.concatenate([dm.train_idx, dm.val_idx, dm.test_idx])
    assert sorted(all_idx.tolist()) == list(range(96))


# --------------------------------------------------------------------------
# scan-fused block == per-step path, bit for bit
# --------------------------------------------------------------------------

def _mlp_setup():
    import flax.linen as nn

    class MLP(nn.Module):
        @nn.compact
        def __call__(self, x, t):
            h = nn.Dense(32)(jnp.concatenate([x, t[:, None]], -1))
            return nn.Dense(x.shape[-1])(nn.swish(h))

    model = MLP()

    def loss_fn(params, batch, rng):
        t = jax.random.uniform(rng, (batch.shape[0],))
        pred = model.apply(params, batch, t)
        return jnp.mean((pred - batch) ** 2)

    opt = optax.adam(1e-3)
    params = model.init(jax.random.PRNGKey(0), jnp.ones((2, 3)),
                        jnp.ones((2,)))
    state = TrainState.create(params, opt.init(params), jax.random.PRNGKey(1))
    return loss_fn, opt, state


def test_train_block_matches_per_step():
    loss_fn, opt, state0 = _mlp_setup()
    table = jnp.asarray(np.random.default_rng(0).normal(size=(40, 3)),
                        jnp.float32)
    gen = lambda idx: table[idx]  # noqa: E731
    mesh = make_mesh()
    k, B = 5, 8
    idx = np.arange(k * B, dtype=np.int32).reshape(k, B)
    w = np.ones((k, B), np.float32)
    w[-1, 5:] = 0.0  # ragged tail in the last row

    block = make_train_block(loss_fn, opt, 0.9, gen, mesh=mesh)
    from jax.sharding import NamedSharding, PartitionSpec as P
    blk_sh = NamedSharding(mesh, P(None, "data"))
    sA = replicate(mesh, state0)
    sA, losses = block(sA, jax.device_put(idx, blk_sh),
                       jax.device_put(w, blk_sh))

    # fresh (deterministically identical) state: the block call above
    # donated the first one's buffers
    loss_fn, opt, state1 = _mlp_setup()
    step = make_train_step(loss_fn, opt, 0.9, mesh=mesh, weighted=True)
    sB = replicate(mesh, state1)
    per = []
    for r in range(k):
        batch = shard_batch(mesh, np.asarray(table[idx[r]]))
        wr = shard_batch(mesh, w[r])
        sB, l = step(sB, batch, wr)
        per.append(float(l))
    np.testing.assert_allclose(np.asarray(losses), per, rtol=1e-6)
    assert int(sA.step) == int(sB.step) == k
    for a, b in zip(jax.tree_util.tree_leaves(sA.params),
                    jax.tree_util.tree_leaves(sB.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves(sA.ema_params),
                    jax.tree_util.tree_leaves(sB.ema_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_train_block_skips_zero_weight_rows():
    loss_fn, opt, state0 = _mlp_setup()
    table = jnp.asarray(np.random.default_rng(0).normal(size=(40, 3)),
                        jnp.float32)
    gen = lambda idx: table[idx]  # noqa: E731
    block = make_train_block(loss_fn, opt, 0.9, gen)

    idx = np.arange(24, dtype=np.int32).reshape(3, 8)
    w = np.ones((3, 8), np.float32)
    sA, _ = block(state0, jnp.asarray(idx), jnp.asarray(w))

    # same rows plus interleaved all-zero rows: identical result
    idx2 = np.zeros((5, 8), np.int32)
    w2 = np.zeros((5, 8), np.float32)
    idx2[[0, 2, 4]] = idx
    w2[[0, 2, 4]] = 1.0
    loss_fn2, opt2, state1 = _mlp_setup()
    sB, losses = block(state1, jnp.asarray(idx2), jnp.asarray(w2))
    assert int(sA.step) == int(sB.step) == 3
    assert float(losses[1]) == 0.0 and float(losses[3]) == 0.0
    for a, b in zip(jax.tree_util.tree_leaves(sA.params),
                    jax.tree_util.tree_leaves(sB.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


# --------------------------------------------------------------------------
# full Trainer.fit in virtual mode (fake 8-device mesh via conftest)
# --------------------------------------------------------------------------

def test_trainer_virtual_e2e(tmp_path):
    cfg = _tiny_config(kind="blobs")
    # 76 train samples / B=16 -> 5 steps per epoch; 4 epochs give 20 steps,
    # so the n_iters=11 budget stops training mid-block (the exact-stop path)
    cfg.training.num_epochs = 4
    cfg.training.n_iters = 11  # exact budget stop inside a block
    tr = Trainer(cfg, workdir=str(tmp_path))
    assert tr._virtual
    state = tr.fit()
    assert int(state.step) == 11
    # metrics written at block granularity
    m = (tmp_path / "metrics.jsonl").read_text().strip().splitlines()
    assert m, "no metrics written"
    # validation over the virtual val split is finite
    val = tr.validate(epoch=0)
    assert np.isfinite(val["eval_loss"])
