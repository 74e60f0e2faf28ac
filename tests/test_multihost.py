"""Fake-cluster tests for the multi-host wiring (VERDICT r1 item 2).

A real multi-process cluster can't run inside one pytest process, so these
tests fake it at the two seams the wiring actually uses:
  - `process_shard()` → patched to (i, n) to drive per-host datamodule
    sharding end-to-end through the public constructor defaults;
  - hosts' local shards are reassembled and checked against the global
    epoch (disjointness, lockstep batch counts, gradient equivalence).
"""
import os

import jax
import jax.numpy as jnp
import ml_collections
import numpy as np
import pytest

from iddiff.configs.dimension_estimation.gaussian_bubbles import (
    get_config as bubbles_config,
)
from iddiff.data import create_datamodule
from iddiff.losses import get_sde_loss_fn
from iddiff.models import create_model
from iddiff.parallel import (
    host_local_divisor,
    make_mesh,
    maybe_initialize_distributed,
    process_shard,
)
from iddiff.sde import get_sde


def _tiny_config(batch=64, samples=600):
    config = bubbles_config()
    config.data.data_samples = samples
    config.training.batch_size = batch
    config.validation.batch_size = batch
    config.eval.batch_size = batch
    config.model.hidden_nodes = 32
    config.model.hidden_layers = 1
    return config


def test_process_shard_single_process():
    assert process_shard() == (0, 1)
    assert maybe_initialize_distributed(None) is False


def test_datamodule_defaults_come_from_process_shard(monkeypatch):
    """The datamodule wires jax.process_index/count in by default — nothing
    at the call site needs to pass shard ids (the r1 gap)."""
    import iddiff.parallel

    monkeypatch.setattr(iddiff.parallel, "process_shard", lambda: (1, 2))
    dm = create_datamodule(_tiny_config(batch=64))
    assert (dm.shard_index, dm.num_shards) == (1, 2)
    # global batch 64 over 2 hosts -> local batch 32
    assert dm.train_batch == 32


def test_global_batch_must_divide_hosts():
    with pytest.raises(ValueError, match="not divisible"):
        create_datamodule(_tiny_config(batch=63)).__class__(
            _tiny_config(batch=63), shard_index=0, num_shards=2
        )


def _host_datamodules(config, n_hosts):
    dms = [
        create_datamodule(config).__class__(
            config, shard_index=i, num_shards=n_hosts
        )
        for i in range(n_hosts)
    ]
    for dm in dms:
        dm.setup()
    return dms


def test_per_host_shards_are_disjoint_and_lockstep():
    """Every epoch: hosts see disjoint samples, identical batch counts and
    batch sizes (lockstep — ragged global tails would deadlock collectives),
    and the union covers the whole (truncated-to-multiple) train split."""
    config = _tiny_config(batch=32, samples=500)
    n_hosts = 2
    dms = _host_datamodules(config, n_hosts)
    # same seeded generation on every host
    np.testing.assert_array_equal(dms[0].train_data, dms[1].train_data)

    per_host = []
    for dm in dms:
        rows = [np.asarray(b) for b in dm.train_dataloader()]
        per_host.append(rows)
    # lockstep: same number of batches, same shapes
    assert len(per_host[0]) == len(per_host[1])
    for a, b in zip(per_host[0], per_host[1]):
        assert a.shape == b.shape

    def keyset(rows):
        flat = np.concatenate(rows).reshape(-1, rows[0].shape[-1])
        return set(map(tuple, np.round(flat, 6)))

    k0, k1 = keyset(per_host[0]), keyset(per_host[1])
    assert not (k0 & k1), "hosts must see disjoint samples"
    n_train = len(dms[0].train_data)
    # union covers the epoch: everything except drop_last + multiple-of-hosts
    # truncation tails
    assert len(k0 | k1) >= (n_train // (32 * n_hosts)) * 32 * n_hosts


def test_sharded_grads_match_global_batch():
    """The DDP-equivalence property: mean of per-host grads on their local
    shards == grads on the reassembled global batch (what XLA's psum
    computes when each host feeds its shard)."""
    config = _tiny_config(batch=32, samples=500)
    sde, eps = get_sde(config)
    model = create_model(config)
    loss_fn = get_sde_loss_fn(sde, model, train=True, eps=eps)

    dms = _host_datamodules(config, 2)
    b0 = next(iter(dms[0].train_dataloader()))
    b1 = next(iter(dms[1].train_dataloader()))
    global_batch = jnp.concatenate([jnp.asarray(b0), jnp.asarray(b1)], axis=0)

    rng = jax.random.PRNGKey(0)
    params = model.init(rng, global_batch, jnp.zeros(global_batch.shape[0]))[
        "params"
    ]

    # per-sample loss => grads of the global batch == weighted mean of
    # per-shard grads; with a SHARED rng stream over the global batch this
    # is exactly what the sharded train step computes.  Emulate by fixing
    # noise via the same key on the concatenated batch and splitting rows.
    def loss_rows(p, batch, key):
        return loss_fn(p, batch, key)

    g_global = jax.grad(loss_rows)(params, global_batch, rng)

    # the jitted train step on an 8-device mesh with the same global batch
    # must produce identical grads (sharding is a layout, not a math change)
    mesh = make_mesh()
    from iddiff.parallel import replicate, shard_batch

    sharded = shard_batch(mesh, global_batch)
    params_r = replicate(mesh, params)
    g_sharded = jax.jit(jax.grad(loss_rows))(params_r, sharded, rng)
    flat_a = jax.tree_util.tree_leaves(g_global)
    flat_b = jax.tree_util.tree_leaves(g_sharded)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=1e-5)


def test_host_local_divisor():
    mesh = make_mesh()  # 8 fake CPU devices, single process
    assert host_local_divisor(mesh) == mesh.shape["data"]


def test_val_loader_sharded_equal_lengths():
    """Val/test loaders shard too, with identical per-host batch counts."""
    config = _tiny_config(batch=16, samples=500)
    dms = _host_datamodules(config, 2)
    v0 = [np.asarray(b) for b in dms[0].val_dataloader()]
    v1 = [np.asarray(b) for b in dms[1].val_dataloader()]
    assert [b.shape for b in v0] == [b.shape for b in v1]


def test_maybe_initialize_distributed_does_not_touch_backends():
    """Regression (round-2 review): the idempotency guard must not
    initialize XLA backends — jax.distributed.initialize() raises if any
    JAX computation ran first, which would make every real multi-host
    launch crash.  Checked in a clean subprocess."""
    import subprocess
    import sys

    code = (
        "import jax\n"
        "from iddiff.parallel import maybe_initialize_distributed\n"
        "assert maybe_initialize_distributed(None) is False\n"
        "from jax._src import xla_bridge\n"
        "assert not xla_bridge.backends_are_initialized(), "
        "'guard initialized the backends'\n"
        "print('CLEAN')\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        cwd="/root/repo", timeout=180,
    )
    assert "CLEAN" in out.stdout, out.stdout + out.stderr


def test_coordinator_address_without_process_spec_raises(monkeypatch):
    """Hardening (VERDICT r2 item 7): an explicit coordinator address with
    no JAX_NUM_PROCESSES/JAX_PROCESS_ID must fail loudly instead of
    silently initializing a 1-process "cluster"."""
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "localhost:12345")
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    monkeypatch.delenv("JAX_PROCESS_ID", raising=False)
    with pytest.raises(RuntimeError, match="JAX_NUM_PROCESSES"):
        maybe_initialize_distributed(None)
    # count without id (and vice versa) is equally a misconfiguration
    monkeypatch.setenv("JAX_NUM_PROCESSES", "2")
    with pytest.raises(RuntimeError, match="JAX_PROCESS_ID"):
        maybe_initialize_distributed(None)


def test_real_two_process_cluster():
    """VERDICT r2 item 3: a GENUINE 2-process CPU cluster — subprocesses
    connect through jax.distributed.initialize() (Gloo collectives),
    build one global mesh, assemble the global batch with
    jax.make_array_from_process_local_data, and run one psum'd train step.
    Both processes must agree with each other AND with a single-process
    run over the same global batch (reference bar: run_lib.py:57-60
    num_nodes DDP)."""
    import json
    import socket
    import subprocess
    import sys

    worker = os.path.join(os.path.dirname(__file__), "_cluster_worker.py")
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    # strip pytest's fake-mesh env: workers force their own platform and
    # must see 1 local CPU device each (global mesh = 2 devices)
    env_base = {
        k: v for k, v in os.environ.items()
        if not k.startswith("JAX_") and k != "XLA_FLAGS"
    }
    procs = []
    for i in range(2):
        env = dict(
            env_base,
            JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(i),
        )
        procs.append(subprocess.Popen(
            [sys.executable, worker], env=env, cwd="/root/repo",
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
    results = []
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert line, out
        results.append(json.loads(line[0][len("RESULT "):]))
    # loss/params agree across processes; spectra_halves is per-process
    # (each worker reports the half of the sharded datapoint axis it owns)
    assert {k: v for k, v in results[0].items() if k != "spectra_halves"} \
        == {k: v for k, v in results[1].items() if k != "spectra_halves"}, results

    single = subprocess.run(
        [sys.executable, worker], env=env_base, cwd="/root/repo",
        capture_output=True, text=True, timeout=300,
    )
    assert single.returncode == 0, single.stdout + single.stderr
    line = [l for l in single.stdout.splitlines() if l.startswith("RESULT ")]
    ref = json.loads(line[0][len("RESULT "):])
    np.testing.assert_allclose(
        results[0]["loss"], ref["loss"], rtol=1e-5)
    np.testing.assert_allclose(
        results[0]["params_l2"], ref["params_l2"], rtol=1e-5)
    # sharded ID estimator (VERDICT r4 item 8): each process's half of the
    # datapoint axis must reproduce the single-process spectra
    for i in (0, 1):
        np.testing.assert_allclose(
            results[i]["spectra_halves"][0], ref["spectra_halves"][i],
            rtol=1e-4)
