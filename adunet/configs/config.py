"""Dataclass config tree with JSON serialisation.

Replaces the reference's three config tiers (dataset_paths constants →
argparse → sbatch env overrides, SURVEY.md §5) with one typed tree. Every
run serialises its resolved config to ``config.json`` like the reference
(train_adaptive_unet.py:541-569). Protocol presets mirror
Segmenation/code/train_adaptive_unet.py:370-403 exactly.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Dict, Optional

__all__ = ["SRTrainConfig", "SegTrainConfig", "ProtocolConfig", "PROTOCOLS", "config_to_json"]


def config_to_json(cfg: Any, **extra: Any) -> str:
    payload = dataclasses.asdict(cfg) if dataclasses.is_dataclass(cfg) else dict(cfg)
    payload.update(extra)
    return json.dumps(payload, indent=2, default=str)


@dataclass
class SRTrainConfig:
    """Adaptive SR trainer config — flag-parity with
    Super_resolution/code/train_adaptive_unet.py:725-804."""

    scale: float
    batch_size: int = 4
    epochs: int = 100
    learning_rate: float = 1e-4
    loss: str = "charbonnier"  # charbonnier | l1 | combined
    patience: int = 10
    val_split: float = 0.1
    test_split: float = 0.1
    limit: Optional[int] = None
    seed: int = 1234
    patch_size: int = 256
    patches_per_image: int = 4
    eval_stride: Optional[int] = None
    shuffle_buffer: int = 1024
    eval_shave: Optional[int] = None
    depth_override: Optional[int] = None
    max_depth: int = 7
    mixed_precision: bool = False  # bf16 compute / f32 params on TPU
    base_channels: int = 64
    residual_head_channels: int = 64
    model_dir: str = "runs/models"
    log_dir: str = "runs/logs"
    run_name: Optional[str] = None
    high_res_dir: Optional[str] = None
    # When set, train on real LR pixels paired by filename (the reference's
    # --low_res_dir alt path, train_adaptive_unet.py:123-197) instead of
    # synthesising LR patches on device.
    low_res_dir: Optional[str] = None
    image_suffix: str = ".png"
    resume_from: Optional[str] = None
    initial_epoch: int = 0
    # Reference quirk made explicit (SURVEY.md §2.5): training degrades at a
    # constant 0.5 regardless of --scale; the evaluator degrades at --scale.
    # Set consistent_degradation=True to train at the model scale instead.
    data_lr_shrink: float = 0.5
    consistent_degradation: bool = False
    remat: bool = False
    # Selective remat: checkpoint only the N shallowest (largest-activation)
    # encoder/decoder levels; None follows --remat for all blocks
    remat_levels: Optional[int] = None
    # split each batch into N sequential micro-batches; one optimizer update
    # on the averaged gradients (exact full-batch math, 1/N activation HBM)
    grad_accum: int = 1
    n_devices: Optional[int] = None  # None = all visible devices
    # channel (tensor) parallelism degree over a 'model' mesh axis
    model_shards: int = 1
    profile: bool = False
    # step-0 TensorBoard preview image count (reference train_adaptive_unet.py:572)
    preview_patches: int = 3
    # Path to VGG19 conv weights (.npz, keys block{i}_conv{j}/kernel|bias,
    # HWIO) for the 'combined' perceptual term. None = seeded random weights
    # (ImageNet weights are not downloadable in the offline build env; drop
    # an artifact in and this flag makes the reference's exact loss
    # available with no code change — reference train_adaptive_unet.py:336-360).
    vgg19_npz: Optional[str] = None
    # stream HR patches as uint8, normalising to [0,1] f32 on device
    uint8_feed: bool = False
    # decode each training image once and keep pixels in host RAM across
    # epoch passes (tf.data .cache() equivalent) — lifts decode-bound hosts
    # to the transfer/compute bound
    cache_decoded: bool = False
    # cache the whole (uniform-size) corpus in HBM; sample patches on device
    device_cache: bool = False
    # overlap per-epoch checkpoint writes with the next epoch's compute
    # (Orbax async save; saves barrier before any restore/close)
    async_checkpoint: bool = False
    # checkpoint cadence in epochs; the final/early-stop epoch always saves
    ckpt_every: int = 1

    def train_degrade_scale(self) -> float:
        return self.scale if self.consistent_degradation else self.data_lr_shrink

    def validate(self) -> None:
        if self.patch_size <= 0:
            raise ValueError("patch_size: expected an integer >= 1.")
        if self.patches_per_image <= 0:
            raise ValueError("patches_per_image: expected a value >= 1.")
        if self.eval_stride is not None and self.eval_stride <= 0:
            raise ValueError("eval_stride: when set, expected a value >= 1.")
        if self.shuffle_buffer < 0:
            raise ValueError("shuffle_buffer: expected a value >= 0.")
        if self.max_depth < 1:
            raise ValueError("max_depth: expected a value >= 1.")
        if self.initial_epoch < 0:
            raise ValueError("initial_epoch: expected a value >= 0.")
        if self.grad_accum < 1:
            raise ValueError("grad_accum: expected a value >= 1.")
        if self.grad_accum > 1 and self.batch_size % self.grad_accum != 0:
            raise ValueError("batch_size must be divisible by grad_accum.")
        if self.initial_epoch >= self.epochs:
            raise ValueError("initial_epoch must be smaller than epochs to resume training.")
        if not 0 < self.scale < 1:
            raise ValueError("scale must be in (0, 1).")
        if self.val_split < 0 or self.test_split < 0:
            raise ValueError("val_split/test_split must be non-negative.")
        if self.val_split + self.test_split == 0:
            # split_indices requires at least one val and one test element
            # (reference split semantics) — catch it at the right knob
            raise ValueError(
                "val_split + test_split must be > 0 (the split keeps >= 1 "
                "validation and >= 1 test image)."
            )
        train_split = 1.0 - (self.val_split + self.test_split)
        if train_split <= 0:
            raise ValueError("val_split + test_split consume the whole corpus; nothing left to train on.")


@dataclass
class ProtocolConfig:
    """Seg training protocol preset (Segmenation trainer :370-403)."""

    key: str
    description: str
    loss: str  # "hybrid_ce_dice(a,b)" | "bce_dice(w1,w2)" encoded by fields below
    loss_alpha: float
    loss_beta: float
    initial_lr: float
    epochs: int
    batch_size: int
    cosine_schedule: bool
    early_stopping_patience: Optional[int]


PROTOCOLS: Dict[str, ProtocolConfig] = {
    "A": ProtocolConfig(
        key="A",
        description="MSCA-UNet hybrid loss (0.4*CE + 0.6*Dice) with cosine annealing",
        loss="hybrid_ce_dice",
        loss_alpha=0.4,
        loss_beta=0.6,
        initial_lr=1e-3,
        epochs=100,
        batch_size=8,
        cosine_schedule=True,
        early_stopping_patience=15,
    ),
    "B": ProtocolConfig(
        key="B",
        description="D2HU-Net BCE+Dice loss (0.5*BCE + 1.0*Dice)",
        loss="bce_dice",
        loss_alpha=0.5,
        loss_beta=1.0,
        initial_lr=3e-4,
        epochs=200,
        batch_size=16,
        cosine_schedule=False,
        early_stopping_patience=None,
    ),
}


@dataclass
class SegTrainConfig:
    """Protocol seg trainer config — flag-parity with
    Segmenation/code/train_adaptive_unet.py:583-607."""

    protocol: str = "A"
    epochs: int = 0  # 0 keeps protocol default
    batch_size: int = 0  # 0 keeps protocol default
    base_channels: int = 64
    depth: int = 4
    image_size: int = 256
    seed: int = 42
    patience: Optional[int] = None  # None uses protocol default
    mixed_precision: bool = False
    model_dir: str = "runs/models"
    log_dir: str = "runs/logs"
    run_name: Optional[str] = None
    train_images: Optional[str] = None
    train_masks: Optional[str] = None
    val_images: Optional[str] = None
    val_masks: Optional[str] = None
    limit: Optional[int] = None
    threshold: float = 0.5
    augment: bool = True
    n_devices: Optional[int] = None
    # Precise-BN: before each validation pass, re-estimate the BatchNorm
    # population statistics from this many un-augmented training batches
    # using the CURRENT weights (0 = keep the 0.99-momentum EMA, the Keras
    # parity behavior). Fixes eval-mode metric collapse when the EMA lags
    # drifting activations on small corpora (round-2 protocol-B seed-42).
    precise_bn: int = 0
    # overlap per-epoch checkpoint writes with the next epoch's compute
    async_checkpoint: bool = False
    # decode+resize each (image, mask) pair once, keep in host RAM across
    # epochs (tf.data .cache() equivalent) — for decode-bound hosts
    cache_decoded: bool = False
    # keep prepared validation batches device-resident between epochs
    # (removes per-epoch decode+transfer). On by default because seg val
    # sets are small (ISIC-scale ~100 MB); disable when the val set
    # competes with a large model for HBM.
    val_device_cache: bool = True

    def resolved(self) -> "SegTrainConfig":
        proto = PROTOCOLS[self.protocol]
        return dataclasses.replace(
            self,
            epochs=self.epochs or proto.epochs,
            batch_size=self.batch_size or proto.batch_size,
            patience=self.patience if self.patience is not None else proto.early_stopping_patience,
        )
