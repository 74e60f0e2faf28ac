from .registry import register_model, get_model, create_model, MODELS
from .score_fn import get_model_fn, get_score_fn, get_conditional_score_fn

# Import model modules so they self-register.
from . import fcn  # noqa: F401
from . import ksphere_gt  # noqa: F401
from . import potentials  # noqa: F401

__all__ = [
    "register_model",
    "get_model",
    "create_model",
    "MODELS",
    "get_model_fn",
    "get_score_fn",
    "get_conditional_score_fn",
]


def _register_heavy_models():
    """Image-stack models import the nn layer library; keep them lazy-ish but
    registered at package import for registry completeness."""
    from . import ddpm_unet  # noqa: F401
    from . import ncsnpp  # noqa: F401
    from . import ncsnv2  # noqa: F401
    from . import ddpm3d  # noqa: F401
    from . import beatgans  # noqa: F401
    from . import csdi  # noqa: F401


try:  # pragma: no cover - exercised via registry tests
    _register_heavy_models()
except ImportError:
    pass
