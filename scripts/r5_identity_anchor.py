"""Identity-PSNR anchors at the EVAL protocol, per scale (round 5).

The training-loop val anchor (epoch-1 val PSNR on 64px patches) is nearly
flat across scales on both synthetic corpora — patch-level PSNR there is
dominated by corpus grain, not the degradation. The honest anchor for the
three-corpus table is the identity model scored under the *exact offline
eval protocol* (grid-tiled 256px patches, Y-channel PSNR, border shave =
2*round(1/scale) — /root/reference/Super_resolution/code/evaluate_model.py:49-54):
the SR model is identity-start (zero-init residual head, reference
behavior train_adaptive_unet.py:292-302), so a fresh state IS the
clip(bicubic-upsample) baseline the reference compares against.

Writes experiments/round5_natural/IDENTITY_ANCHORS.json:
  {"<scale>": {"psnr_mean": ..., "ssim_mean": ..., "samples": N}, ...}

Usage (CPU is fine — 48 patches/scale):
  JAX_PLATFORMS=cpu python scripts/r5_identity_anchor.py \
      --hr_dir /tmp/r5nat/eval_hr --out experiments/round5_natural/IDENTITY_ANCHORS.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--hr_dir", type=Path, required=True)
    p.add_argument("--scales", type=float, nargs="+", default=[0.2, 0.3, 0.5, 0.7])
    p.add_argument("--patch_size", type=int, default=256)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--out", type=Path, required=True)
    args = p.parse_args()

    from adunet.utils.runtime import setup_runtime

    setup_runtime()

    import jax
    import jax.numpy as jnp
    import optax

    from adunet.data import find_images, make_eval_patch_dataset
    from adunet.evaluate import evaluate_sr, infer_eval_shave
    from adunet.models import build_super_resolution_unet
    from adunet.train import create_train_state

    hr_files = find_images(args.hr_dir, ".png", None)
    anchors = {}
    for scale in args.scales:
        ds, total, _labels = make_eval_patch_dataset(
            hr_files,
            patch_size=args.patch_size,
            scale=scale,
            batch_size=args.batch_size,
        )
        model, _info = build_super_resolution_unet(scale=scale, input_size=args.patch_size)
        sample = jnp.zeros((1, args.patch_size, args.patch_size, 3), jnp.float32)
        # eval only reads params — a stateless tx avoids allocating Adam
        # moments for the deep (34M-param) scale-0.7 arm on a shared chip
        state = create_train_state(model, jax.random.key(0), sample, optax.identity())
        results, _per = evaluate_sr(state, ds, scale, infer_eval_shave(scale))
        del state, ds  # free HBM before the next (deeper) arm
        anchors[f"{scale:g}"] = {
            "psnr_mean": results.psnr_mean,
            "ssim_mean": results.ssim_mean,
            "samples": results.samples,
        }
        print(f"scale {scale:g}: identity PSNR(Y) {results.psnr_mean:.2f} dB "
              f"SSIM {results.ssim_mean:.4f} over {results.samples} patches")

    args.out.parent.mkdir(parents=True, exist_ok=True)
    args.out.write_text(json.dumps(anchors, indent=1) + "\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
