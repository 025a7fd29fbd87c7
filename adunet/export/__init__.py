"""AOT export / serving artifacts (StableHLO via jax.export)."""

from adunet.export.aot import (
    ARTIFACT_FILE,
    MANIFEST_FILE,
    export_joint_forward,
    export_seg_forward,
    export_sr_forward,
    load_artifact,
    save_artifact,
)

__all__ = [
    "ARTIFACT_FILE",
    "MANIFEST_FILE",
    "export_joint_forward",
    "export_seg_forward",
    "export_sr_forward",
    "load_artifact",
    "save_artifact",
]
