"""Training: metrics, optimizers, train/pretrain loops, checkpointing, EMA."""

from .metrics import (
    MAE,
    MR,
    MSE,
    PSNR,
    RMSE,
    SSIM,
    TrainMetrics,
    ValidationMetrics,
    create_metric_dict,
)
from .optimizers import get_optimizer
from .checkpoint import CheckpointManager

__all__ = [
    "MAE",
    "MR",
    "MSE",
    "PSNR",
    "RMSE",
    "SSIM",
    "TrainMetrics",
    "ValidationMetrics",
    "create_metric_dict",
    "get_optimizer",
    "CheckpointManager",
]
