"""Numeric ops for srewd_tpu.

All ops operate on NHWC arrays and are designed to lower onto the TPU MXU/VPU:
resampling is expressed as small dense separable matmuls, the Haar DWT as
reshape/adds, SSIM as depthwise average pooling.
"""

from .resize import resize2d, resize_matrix, upsample_nearest2x
from .wavelets import haar_dwt2d, haar_dwt_pyramid
from .ssim import ssim
from .finite_diff import fd_stencils
from .moments import k2m, m2k, moment_constraint_loss

__all__ = [
    "k2m",
    "m2k",
    "moment_constraint_loss",
    "resize2d",
    "resize_matrix",
    "upsample_nearest2x",
    "haar_dwt2d",
    "haar_dwt_pyramid",
    "ssim",
    "fd_stencils",
]
