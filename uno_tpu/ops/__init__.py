from uno_tpu.ops.norm import instance_norm
from uno_tpu.ops.resample import resize, resize_matrix
from uno_tpu.ops.spectral import (
    fourier_truncate_3d,
    spectral_conv_1d,
    spectral_conv_2d,
    spectral_conv_3d,
    spectral_weight_init,
)

__all__ = [
    "instance_norm",
    "resize",
    "resize_matrix",
    "fourier_truncate_3d",
    "spectral_conv_1d",
    "spectral_conv_2d",
    "spectral_conv_3d",
    "spectral_weight_init",
]
