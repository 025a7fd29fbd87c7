"""Ahead-of-time model export for serving (jax.export / StableHLO).

The reference has no deployment surface at all — models live as `.keras`
pickles that require the full training codebase (custom-object registry,
rebuild fallback — evaluate_model.py:57-91) to even load. The TPU-native
serving story is the opposite: export the *compiled program*. `jax.export`
lowers the jitted restoration forward to StableHLO with the trained weights
baked in as constants, producing a single self-contained artifact that any
JAX process (CPU or TPU, no adunet import needed) can deserialize and call.

Artifact layout (a directory):
    model.stablehlo   serialized jax.export payload (weights embedded)
    manifest.json     scale/depth/shapes/platforms/param-count metadata
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

ARTIFACT_FILE = "model.stablehlo"
MANIFEST_FILE = "manifest.json"

DEFAULT_PLATFORMS = ("tpu", "cpu")


def export_sr_forward(
    state: Any,
    patch_size: int,
    batch_size: int,
    platforms: Sequence[str] = DEFAULT_PLATFORMS,
):
    """Export the clipped SR restoration forward (LR tiles -> restored tiles)
    with ``state.params`` baked in as program constants.

    Returns a ``jax.export.Exported``. The exported signature is
    ``f(tiles: f32[batch, patch, patch, 3]) -> f32[batch, patch, patch, 3]``.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jax_export

    params = jax.device_get(state.params)  # bake host copies, not tunnels
    apply_fn = state.apply_fn

    def forward(tiles):
        pred = apply_fn({"params": params}, tiles)
        return jnp.clip(pred.astype(jnp.float32), 0.0, 1.0)

    spec = jax.ShapeDtypeStruct((batch_size, patch_size, patch_size, 3), jnp.float32)
    return jax_export.export(jax.jit(forward), platforms=tuple(platforms))(spec)


def export_seg_forward(
    state: Any,
    image_size: int,
    batch_size: int,
    platforms: Sequence[str] = DEFAULT_PLATFORMS,
):
    """Export the seg inference forward (images -> mask probabilities) with
    params AND BatchNorm running statistics baked in as constants.

    The exported signature is
    ``f(images: f32[batch, size, size, 3]) -> f32[batch, size, size, C]``
    (C = 1 sigmoid channel or num_classes softmax channels — whatever head
    the checkpointed model carries).
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jax_export

    params = jax.device_get(state.params)
    batch_stats = (
        jax.device_get(state.batch_stats) if state.batch_stats is not None else None
    )
    apply_fn = state.apply_fn

    def forward(images):
        variables = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        return apply_fn(variables, images, train=False).astype(jnp.float32)

    spec = jax.ShapeDtypeStruct((batch_size, image_size, image_size, 3), jnp.float32)
    return jax_export.export(jax.jit(forward), platforms=tuple(platforms))(spec)


def export_joint_forward(
    state: Any,
    image_size: int,
    batch_size: int,
    platforms: Sequence[str] = DEFAULT_PLATFORMS,
):
    """Export the joint SR+seg forward: images -> {"sr": ..., "mask": ...}.

    Both heads ship in ONE program (shared encoder runs once); the exported
    signature is ``f(f32[b,s,s,3]) -> {"sr": f32[b,s,s,3], "mask": f32[b,s,s,C]}``.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jax_export

    params = jax.device_get(state.params)
    apply_fn = state.apply_fn

    def forward(images):
        sr, mask = apply_fn({"params": params}, images, train=False)
        return {
            "sr": jnp.clip(sr.astype(jnp.float32), 0.0, 1.0),
            "mask": mask.astype(jnp.float32),
        }

    spec = jax.ShapeDtypeStruct((batch_size, image_size, image_size, 3), jnp.float32)
    return jax_export.export(jax.jit(forward), platforms=tuple(platforms))(spec)


def save_artifact(
    exported: Any,
    out_dir: str | Path,
    meta: Optional[Dict[str, Any]] = None,
) -> Path:
    """Serialize an ``Exported`` plus a manifest into ``out_dir``."""
    import jax

    out_dir = Path(out_dir).expanduser()
    out_dir.mkdir(parents=True, exist_ok=True)
    payload = exported.serialize()
    (out_dir / ARTIFACT_FILE).write_bytes(payload)

    in_aval = exported.in_avals[0]
    manifest = {
        "format": "jax.export.stablehlo",
        "jax_version": jax.__version__,
        "platforms": list(exported.platforms),
        "input_shape": list(in_aval.shape),
        "input_dtype": str(in_aval.dtype),
        "artifact_bytes": len(payload),
        **(meta or {}),
    }
    (out_dir / MANIFEST_FILE).write_text(json.dumps(manifest, indent=2))
    return out_dir


def load_artifact(path: str | Path) -> Tuple[Callable, Dict[str, Any]]:
    """Deserialize an artifact directory (or a bare ``.stablehlo`` file).

    Returns ``(call, manifest)`` where ``call(tiles)`` runs the program on
    the current default backend. No adunet model code is touched — the whole
    network lives inside the StableHLO payload.
    """
    from jax import export as jax_export

    path = Path(path).expanduser()
    if path.is_dir():
        blob = (path / ARTIFACT_FILE).read_bytes()
        mf = path / MANIFEST_FILE
        manifest = json.loads(mf.read_text()) if mf.exists() else {}
    else:
        blob = path.read_bytes()
        manifest = {}
    exported = jax_export.deserialize(blob)
    return exported.call, manifest
