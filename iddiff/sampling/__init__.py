from .predictors import register_predictor, get_predictor, PREDICTORS
from .correctors import register_corrector, get_corrector, CORRECTORS
from .pc import get_pc_sampler, get_pc_inpainter
from .ode import get_ode_sampler
from .factory import get_sampling_fn
from .conditional import get_conditional_sampling_fn, get_pc_conditional_sampler

__all__ = [
    "register_predictor",
    "get_predictor",
    "PREDICTORS",
    "register_corrector",
    "get_corrector",
    "CORRECTORS",
    "get_pc_sampler",
    "get_pc_inpainter",
    "get_ode_sampler",
    "get_sampling_fn",
    "get_conditional_sampling_fn",
    "get_pc_conditional_sampler",
]
