"""Model families: adaptive/vanilla SR U-Nets, adaptive/vanilla seg U-Nets."""

from adunet.models.sr_adaptive import AdaptiveSRUNet, build_super_resolution_unet
from adunet.models.sr_vanilla import VanillaSRUNet
from adunet.models.seg_adaptive import AdaptiveSegUNet, build_adaptive_depth_unet
from adunet.models.seg_vanilla import VanillaSegUNet, build_unet
from adunet.models.joint import JointSRSegUNet, build_joint_unet

__all__ = [
    "JointSRSegUNet",
    "build_joint_unet",
    "AdaptiveSRUNet",
    "build_super_resolution_unet",
    "VanillaSRUNet",
    "AdaptiveSegUNet",
    "build_adaptive_depth_unet",
    "VanillaSegUNet",
    "build_unet",
]
