from .mesh import make_mesh, shard_batch, replicate, infer_param_sharding

__all__ = ["make_mesh", "shard_batch", "replicate", "infer_param_sharding"]
