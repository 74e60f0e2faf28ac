"""Device-mesh construction and sharding rules.

The reference's entire distributed layer is Lightning DDP over NCCL
(/root/reference/run_lib.py:57-60, SURVEY.md §2.13).  The TPU-native
equivalent is a `jax.sharding.Mesh` over ('data', 'model'):

  - data axis:  batch/datapoint sharding (DDP equivalent) — gradients are
    averaged by XLA-inserted psum over ICI, replacing NCCL allreduce.
  - model axis: tensor-parallel sharding of large Dense kernels (the
    reference has no TP; the axis is reserved per SURVEY §2.13 so wide
    MLPs / U-Net channels can shard).

No custom communication code: XLA chooses collectives from shardings.
"""
from __future__ import annotations

import math

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_initialize_distributed(config=None):
    """Multi-host initialization (the jax equivalent of Lightning's
    num_nodes/DDP launch, run_lib.py:57-60): call once per host before mesh
    construction.  No-ops single-process.  Triggers:

      - JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars
        (or config.training.coordinator_address) — explicit cluster spec;
      - config.training.num_nodes > 1 — bare jax.distributed.initialize(),
        which auto-detects the cluster on TPU pod slices (GCE metadata).

    Idempotent: safe to call from both main.py and run_lib.train.
    """
    import os

    # NOTE: must NOT touch jax.process_count()/jax.devices() here — they
    # initialize the XLA backends, after which jax.distributed.initialize()
    # raises (caught in round-2 self-review; reproduced on jax 0.9.0)
    if jax.distributed.is_initialized():
        return True  # already initialized
    addr = None
    num_nodes = 1
    if config is not None:
        addr = config.training.get("coordinator_address", None)
        num_nodes = int(config.training.get("num_nodes", 1))
    addr = addr or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr is not None:
        num_procs = os.environ.get("JAX_NUM_PROCESSES")
        proc_id = os.environ.get("JAX_PROCESS_ID")
        if num_procs is None or proc_id is None:
            # A coordinator address with no explicit process count/id would
            # silently initialize a 1-process "cluster" — always a
            # misconfiguration (the point of setting the address is >1).
            raise RuntimeError(
                "coordinator_address is set "
                f"({addr!r}) but JAX_NUM_PROCESSES/JAX_PROCESS_ID are not "
                "both set; export both on every host (see "
                "cluster/run_tpu.sh) or unset the address for "
                "single-process runs.")
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=int(num_procs),
            process_id=int(proc_id),
        )
        return True
    if num_nodes > 1:
        jax.distributed.initialize()  # TPU pod auto-detection
        return True
    return False


def process_shard():
    """(shard_index, num_shards) for per-host data sharding — the
    DistributedSampler replacement (SURVEY.md §2.13)."""
    return jax.process_index(), jax.process_count()


def host_local_divisor(mesh: Mesh) -> int:
    """Number of data-axis shards this host feeds: a host-local batch must
    have a leading dim divisible by this for `shard_batch` to place it."""
    return max(1, mesh.shape["data"] // jax.process_count())


def make_mesh(n_data: int | None = None, n_model: int = 1, devices=None) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n_total = len(devices)
    if n_data is None:
        n_data = n_total // n_model
    use = n_data * n_model
    grid = np.array(devices[:use]).reshape(n_data, n_model)
    return Mesh(grid, ("data", "model"))


def shard_batch(mesh: Mesh, batch):
    """Place a host batch (or tuple/dict of arrays) sharded over 'data'.

    Single-process: a plain device_put with a NamedSharding.
    Multi-host: each host passes its LOCAL shard (1/process_count of the
    global batch, from EpochIterator's per-host sharding) and the global
    array is assembled with jax.make_array_from_process_local_data — the
    jax equivalent of DistributedSampler + DDP scatter.
    """
    multihost = jax.process_count() > 1

    def put(x):
        spec = P("data") if getattr(x, "ndim", 0) >= 1 else P()
        sharding = NamedSharding(mesh, spec)
        if multihost and getattr(x, "ndim", 0) >= 1:
            return jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            )
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params/opt state) across the whole mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def infer_param_sharding(params, mesh: Mesh, min_shard_size: int = 1024):
    """Tensor-parallel rule: shard the largest axis of big kernels over 'model'.

    Returns a pytree of NamedShardings.  Axes are only sharded when they
    divide evenly by the model-axis size; everything else is replicated.
    """
    n_model = mesh.shape["model"]

    def rule(x):
        if n_model == 1 or x.ndim < 2 or x.size < min_shard_size:
            return NamedSharding(mesh, P())
        axis = int(np.argmax(x.shape))
        if x.shape[axis] % n_model != 0:
            return NamedSharding(mesh, P())
        spec = [None] * x.ndim
        spec[axis] = "model"
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map(rule, params)
