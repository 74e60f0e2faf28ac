from .mesh import (
    host_local_divisor,
    infer_param_sharding,
    make_mesh,
    maybe_initialize_distributed,
    process_shard,
    replicate,
    shard_batch,
)

__all__ = [
    "host_local_divisor",
    "infer_param_sharding",
    "make_mesh",
    "maybe_initialize_distributed",
    "process_shard",
    "replicate",
    "shard_batch",
]
