from .attention import attention, set_flash_attention, flash_attention_enabled
from .upfirdn2d import (upfirdn2d, upfirdn2d_native, upsample_2d,
                        downsample_2d, conv_downsample_blur)
from .fused_act import fused_leaky_relu
from .group_norm import (
    fused_groupnorm_enabled,
    group_norm_act,
    group_norm_act_reference,
    set_fused_groupnorm,
)

__all__ = [
    "upfirdn2d",
    "upfirdn2d_native",
    "upsample_2d",
    "downsample_2d",
    "conv_downsample_blur",
    "attention",
    "set_flash_attention",
    "flash_attention_enabled",
    "fused_leaky_relu",
    "fused_groupnorm_enabled",
    "group_norm_act",
    "group_norm_act_reference",
    "set_fused_groupnorm",
]
