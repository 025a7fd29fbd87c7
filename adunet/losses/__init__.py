"""Loss zoo: SR (charbonnier/l1/combined) and seg (BCE+Dice hybrids)."""

from adunet.losses.sr import (
    charbonnier_loss,
    l1_loss,
    mse_loss,
    ssim_loss,
    psnr_metric,
    build_losses_and_metrics,
)
from adunet.losses.seg import (
    binary_crossentropy,
    categorical_crossentropy,
    make_weighted_ce_loss,
    dice_loss,
    make_hybrid_ce_dice_loss,
    make_bce_dice_loss,
)
from adunet.losses.perceptual import (
    VGG19Features,
    vgg19_preprocess,
    load_vgg19_params,
    make_perceptual_fn,
)

__all__ = [
    "charbonnier_loss",
    "l1_loss",
    "mse_loss",
    "ssim_loss",
    "psnr_metric",
    "build_losses_and_metrics",
    "binary_crossentropy",
    "categorical_crossentropy",
    "make_weighted_ce_loss",
    "dice_loss",
    "make_hybrid_ce_dice_loss",
    "make_bce_dice_loss",
    "VGG19Features",
    "vgg19_preprocess",
    "load_vgg19_params",
    "make_perceptual_fn",
]
