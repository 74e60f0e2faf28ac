from .upfirdn2d import upfirdn2d, upfirdn2d_native, upsample_2d, downsample_2d
from .fused_act import fused_leaky_relu

__all__ = [
    "upfirdn2d",
    "upfirdn2d_native",
    "upsample_2d",
    "downsample_2d",
    "fused_leaky_relu",
]
