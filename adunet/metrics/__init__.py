"""Quality metrics: PSNR/SSIM/MS-SSIM (BT.601 luma) and Dice/IoU — pure jnp."""

from adunet.metrics.psnr_ssim import psnr, mse_per_image, ssim, ssim_multiscale
from adunet.metrics.seg import (
    dice_coefficient,
    iou_score,
    mean_iou,
    global_dice_coefficient,
    binary_accuracy,
    precision,
    recall,
    PooledMetric,
    pooled_global_dice,
    pooled_precision,
    pooled_recall,
    pooled_mean_iou,
)

__all__ = [
    "psnr",
    "mse_per_image",
    "ssim",
    "ssim_multiscale",
    "dice_coefficient",
    "iou_score",
    "mean_iou",
    "global_dice_coefficient",
    "binary_accuracy",
    "precision",
    "recall",
    "PooledMetric",
    "pooled_global_dice",
    "pooled_precision",
    "pooled_recall",
    "pooled_mean_iou",
]
