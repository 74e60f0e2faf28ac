from .dsm import get_sde_loss_fn

__all__ = ["get_sde_loss_fn"]
