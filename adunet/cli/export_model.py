"""Export a trained SR checkpoint to a self-contained serving artifact.

Completes the deployment path the reference never had (its `.keras` files
need the training repo's custom-object registry to load —
evaluate_model.py:57-91). The artifact is StableHLO with weights baked in;
`adunet.export.load_artifact` (or any plain jax.export consumer) runs it on
CPU or TPU without importing the model code. `cli/restore.py --from-export`
consumes it for tiled batch restoration.
"""

from __future__ import annotations

import argparse
from pathlib import Path
from typing import List, Optional


def parse_args(argv: Optional[List[str]] = None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(description="Export a trained SR model to a StableHLO serving artifact.")
    parser.add_argument("--model-path", type=Path, required=True,
                        help="Orbax checkpoint root (directory written by train_sr).")
    parser.add_argument("--scale", type=float, required=True)
    parser.add_argument("--output-dir", type=Path, required=True)
    parser.add_argument("--patch-size", type=int, default=256)
    parser.add_argument("--batch-size", type=int, default=8,
                        help="Static tile-batch size of the exported program.")
    parser.add_argument("--platforms", type=str, default="tpu,cpu",
                        help="Comma-separated lowering targets baked into the artifact.")
    parser.add_argument("--depth-override", type=int, default=None)
    parser.add_argument("--latest", action="store_true",
                        help="Export the most recent checkpoint instead of the best-val one.")
    return parser.parse_args(argv)


def main(argv: Optional[List[str]] = None) -> None:
    from adunet.utils.runtime import setup_runtime

    setup_runtime()
    args = parse_args(argv)

    import jax
    import numpy as np

    from adunet.cli.evaluate import load_checkpoint_state
    from adunet.export import export_sr_forward, save_artifact

    state, _model, info = load_checkpoint_state(
        args.model_path, args.scale, args.patch_size, args.depth_override,
        best=not args.latest,
    )
    platforms = tuple(p.strip() for p in args.platforms.split(",") if p.strip())
    exported = export_sr_forward(
        state, patch_size=args.patch_size, batch_size=args.batch_size,
        platforms=platforms,
    )
    out = save_artifact(
        exported,
        args.output_dir,
        meta={
            "model": "adaptive_sr_unet",
            "scale": args.scale,
            "depth": info["depth"],
            "param_count": int(sum(
                int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(state.params)
            )),
            "checkpoint": str(Path(args.model_path).expanduser()),
        },
    )
    size_mb = (out / "model.stablehlo").stat().st_size / 1e6
    print(f"[export] depth-{info['depth']} model -> {out} "
          f"({size_mb:.1f} MB, platforms={list(platforms)})")


if __name__ == "__main__":
    main()
