from .compile_cache import enable_compile_cache
from .core import (
    batch_mul,
    flatten_batch,
    Registry,
    tree_size,
)

__all__ = ["batch_mul", "enable_compile_cache", "flatten_batch", "Registry",
           "tree_size"]
