from .torch_import import (
    convert_by_structure,
    extract_ema_state_dict,
    convert_ddpm_state_dict,
    convert_fcn_state_dict,
    convert_reference_checkpoint,
)

__all__ = [
    "convert_by_structure",
    "extract_ema_state_dict",
    "convert_ddpm_state_dict",
    "convert_fcn_state_dict",
    "convert_reference_checkpoint",
]
