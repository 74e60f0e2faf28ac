from .core import (
    batch_mul,
    flatten_batch,
    Registry,
    tree_size,
)

__all__ = ["batch_mul", "flatten_batch", "Registry", "tree_size"]
