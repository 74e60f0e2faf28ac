from .likelihood import get_likelihood_fn

__all__ = ["get_likelihood_fn"]
