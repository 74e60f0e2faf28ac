from .sdes import (
    SDE,
    VESDE,
    VPSDE,
    SubVPSDE,
    SNRSDE,
    CVESDE,
    ReverseSDE,
    get_sde,
)

__all__ = [
    "SDE",
    "VESDE",
    "VPSDE",
    "SubVPSDE",
    "SNRSDE",
    "CVESDE",
    "ReverseSDE",
    "get_sde",
]
