"""adunet — TPU-native (JAX/XLA/Pallas/pjit) Adaptive-Depth U-Net framework.

A ground-up rebuild of the capabilities of
``KunalNN/Adaptive-Depth-U-Net-for-Image-Super-Resolution-Segmentation``
(reference mounted read-only at ``/root/reference``), designed TPU-first:

- All compute-path ops are jit-compiled (the reference had to *disable* XLA
  because ``tf.image.resize`` lacked an XLA kernel on its cluster —
  ``Super_resolution/code/train_adaptive_unet.py:43-44``). Here the fractional
  antialiased resize is a first-class XLA op implemented as separable
  weight-matrix contractions that map straight onto the MXU.
- Models are Flax modules; training runs under ``jax.jit`` over a
  ``jax.sharding.Mesh`` with batch-sharded inputs and replicated params
  (data-parallel gradient all-reduce compiles onto ICI).
- Checkpoints are Orbax pytrees + a config-driven model rebuild — no pickled
  graphs (the reference needed custom-object registries and rebuild fallbacks,
  ``Super_resolution/code/evaluate_model.py:57-91``).

Subpackages
-----------
- ``ops``      — pure-jnp image ops (resize, degradation, luma, residual add)
- ``nn``       — depth policies and shared module building blocks
- ``kernels``  — Pallas TPU kernels for the hot fused ops
- ``models``   — SR and segmentation U-Net families
- ``data``     — file discovery/pairing, splits, patch pipelines, augmentation
- ``losses``   — charbonnier / l1 / combined(SSIM+perceptual) / BCE+Dice hybrids
- ``metrics``  — PSNR/SSIM/MS-SSIM on BT.601 luma, Dice/IoU
- ``parallel`` — mesh construction and sharding rules
- ``train``    — jit train loops, schedules, early stopping, Orbax checkpoints
- ``evaluate`` — grid-tiling offline evaluator + JSON/CSV reports
- ``tune``     — hyperparameter search (optuna if present, built-in fallback)
- ``cli``      — command-line entry points mirroring the reference scripts
"""

__version__ = "0.1.0"
