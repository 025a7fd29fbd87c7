"""Fixed-depth-3 SR trainer wrapper (Experiment 1).

Rebuild of /root/reference/Super_resolution/code/train_adaptive_unet_depth_3.py:
delegates to the main trainer with depth_override=3 and max_depth=3 pinned.
"""

from __future__ import annotations

from typing import List, Optional

from adunet.cli.train_sr import config_from_args, parse_args, train


def main(argv: Optional[List[str]] = None) -> None:
    from adunet.utils.runtime import setup_runtime

    setup_runtime()  # persistent compile cache etc., as every entry point
    args = parse_args(argv)
    args.depth_override = 3
    args.max_depth = 3
    cfg = config_from_args(args)
    train(cfg)


if __name__ == "__main__":
    main()
