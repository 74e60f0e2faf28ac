"""Parallelism coverage: grad accumulation, dp×tp sharded training, mesh utils."""
import jax
import jax.numpy as jnp
import ml_collections
import numpy as np
import optax
import pytest

from iddiff.losses import get_sde_loss_fn
from iddiff.models import create_model
from iddiff.parallel import infer_param_sharding, make_mesh, replicate, shard_batch
from iddiff.sde import VESDE
from iddiff.training import TrainState, make_optimizer, make_train_step
from tests.test_models import fcn_config


def test_make_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape["data"] * mesh.shape["model"] <= len(jax.devices())
    mesh2 = make_mesh(n_data=4, n_model=2)
    assert mesh2.shape == {"data": 4, "model": 2}


def test_gradient_accumulation_equivalence():
    """optax.MultiSteps over k microbatches ≈ one big-batch step."""
    config = ml_collections.ConfigDict()
    config.optim = ml_collections.ConfigDict(dict(
        optimizer="Adam", lr=1e-2, beta1=0.9, eps=1e-8, weight_decay=0.0,
        warmup=0, grad_clip=-1.0,
    ))
    config.training = ml_collections.ConfigDict({"accumulate_grad_batches": 2})

    mconf = fcn_config(state_size=4, hidden_layers=1, hidden_nodes=16)
    model = create_model(mconf)
    sde = VESDE(sigma_min=0.01, sigma_max=2.0, N=10)
    x = jax.random.normal(jax.random.PRNGKey(0), (32, 4))
    params = model.init(jax.random.PRNGKey(1), x, jnp.zeros((32,)))["params"]

    # deterministic loss: fixed t and z via fixed rng inside loss
    loss_fn = get_sde_loss_fn(sde, model, train=True, eps=1e-3)

    opt_acc = make_optimizer(config)
    state = TrainState.create(params, opt_acc.init(params), jax.random.PRNGKey(2))
    step = make_train_step(loss_fn, opt_acc, ema_rate=0.0)
    # two microbatch steps = one real update
    p0 = jax.tree_util.tree_map(lambda p: np.asarray(p).copy(), state.params)
    state, _ = step(state, x[:16])
    mid = jax.tree_util.tree_map(lambda p: np.asarray(p).copy(), state.params)
    # after first microbatch, params unchanged (accumulating)
    for a, b in zip(jax.tree_util.tree_leaves(p0),
                    jax.tree_util.tree_leaves(mid)):
        np.testing.assert_array_equal(a, b)
    state, _ = step(state, x[16:])
    end = jax.tree_util.tree_leaves(state.params)
    changed = any(
        not np.allclose(a, np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(p0), end)
    )
    assert changed  # second microbatch applied the update


def test_tensor_parallel_train_step():
    """dp×tp mesh: wide Dense kernels sharded over 'model', one step runs
    and the loss matches the replicated run."""
    mesh = make_mesh(n_data=4, n_model=2)
    mconf = fcn_config(state_size=8, hidden_layers=1, hidden_nodes=256)
    model = create_model(mconf)
    sde = VESDE(sigma_min=0.01, sigma_max=2.0, N=10)
    x = jax.random.normal(jax.random.PRNGKey(0), (16, 8))
    params = model.init(jax.random.PRNGKey(1), x, jnp.zeros((16,)))["params"]
    # host snapshot BEFORE any donating step runs
    params_np = jax.tree_util.tree_map(lambda p: np.asarray(p).copy(), params)
    loss_fn = get_sde_loss_fn(sde, model, train=True, eps=1e-3)
    optimizer = optax.adam(1e-3)
    state = TrainState.create(params, optimizer.init(params),
                              jax.random.PRNGKey(2))

    sharding = infer_param_sharding(state, mesh, min_shard_size=512)
    # at least one kernel actually sharded over 'model'
    specs = [s.spec for s in jax.tree_util.tree_leaves(sharding)]
    assert any("model" in str(s) for s in specs), specs

    state_tp = jax.tree_util.tree_map(jax.device_put, state, sharding)
    step_tp = make_train_step(loss_fn, optimizer, ema_rate=0.9, mesh=mesh,
                              state_sharding=sharding)
    batch = shard_batch(mesh, x)
    state_tp, loss_tp = step_tp(state_tp, batch)

    # replicated single-device run with identical inputs (fresh buffers —
    # the TP step may have donated aliases of the originals)
    params_ref = jax.tree_util.tree_map(jnp.asarray, params_np)
    state_ref = TrainState.create(params_ref, optimizer.init(params_ref),
                                  jax.random.PRNGKey(2))
    step_ref = make_train_step(loss_fn, optimizer, ema_rate=0.9)
    state_ref, loss_ref = step_ref(state_ref, x)
    np.testing.assert_allclose(float(loss_tp), float(loss_ref), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(state_tp.params),
                    jax.tree_util.tree_leaves(state_ref.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_shard_batch_and_replicate():
    mesh = make_mesh(n_data=8, n_model=1)
    x = jnp.arange(16.0).reshape(16, 1)
    xs = shard_batch(mesh, x)
    assert xs.sharding.spec == jax.sharding.PartitionSpec("data")
    tree = replicate(mesh, {"a": jnp.ones((3,))})
    assert tree["a"].sharding.spec == jax.sharding.PartitionSpec()


def test_per_host_shard_iterator():
    """EpochIterator shard hooks: disjoint per-host coverage (replaces
    Lightning's DistributedSampler, SURVEY §2.13)."""
    from iddiff.data.datamodule import EpochIterator

    data = np.arange(32.0).reshape(32, 1)
    parts = []
    for host in range(4):
        it = EpochIterator((data,), batch_size=4, shuffle=True, seed=9,
                           shard_index=host, num_shards=4)
        parts.append(np.concatenate(list(it)))
    allv = np.concatenate(parts)
    assert len(allv) == 32
    assert len(np.unique(allv)) == 32  # disjoint cover


def test_profiler_trace_hook(tmp_path):
    """config.training.profile_dir writes a jax profiler trace."""
    import os

    from iddiff.training import Trainer
    from tests.test_training import tiny_bubbles_config

    config = tiny_bubbles_config()
    config.training.num_epochs = 3
    config.training.profile_dir = str(tmp_path / "prof")
    config.training.profile_epoch = 1
    config.training.visualization_callback = None
    trainer = Trainer(config, workdir=str(tmp_path / "run"))
    trainer.fit()
    assert os.path.isdir(tmp_path / "prof")
    found = any(
        f.endswith((".pb", ".json.gz", ".trace.json.gz"))
        for _, _, files in os.walk(tmp_path / "prof") for f in files
    )
    assert found
