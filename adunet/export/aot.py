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
    weights.npz       int8 weight leaves (only for --quantize exports,
                      where weights ride as program inputs — see
                      QuantizedExported)
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

ARTIFACT_FILE = "model.stablehlo"
MANIFEST_FILE = "manifest.json"
WEIGHTS_FILE = "weights.npz"

DEFAULT_PLATFORMS = ("tpu", "cpu")


def quantize_params_int8(params):
    """Weight-only int8 quantization of conv kernels (per-output-channel
    symmetric scales). Returns a pytree mirroring ``params`` where every
    4-D conv kernel is replaced by ``{"q": int8, "scale": f32[C_out]}``;
    biases / norm affines stay float32 (they are a rounding-error-sized
    fraction of the bytes). Serving artifacts shrink ~4x; the forward
    dequantizes on the fly (one fused multiply per kernel — weight-only
    quantization in the production-server sense, not compute quantization)."""
    import jax
    import numpy as np

    def quantize(leaf):
        w = np.asarray(jax.device_get(leaf))
        if w.ndim != 4:  # conv kernels only (HWIO)
            return w
        scale = np.abs(w).max(axis=(0, 1, 2)) / 127.0
        scale = np.maximum(scale, 1e-12).astype(np.float32)
        q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
        return {"q": q, "scale": scale}

    return jax.tree_util.tree_map(quantize, params)


def _dequantize_params(params):
    import jax
    import jax.numpy as jnp

    def dequant(leaf):
        if isinstance(leaf, dict) and set(leaf) == {"q", "scale"}:
            return leaf["q"].astype(jnp.float32) * leaf["scale"]
        return leaf

    return jax.tree_util.tree_map(
        dequant, params, is_leaf=lambda l: isinstance(l, dict) and set(l) == {"q", "scale"}
    )


class QuantizedExported:
    """A ``jax.export.Exported`` paired with external quantized weight leaves.

    The int8 weights are program INPUTS, not baked constants: ops on concrete
    (non-tracer) values run eagerly during tracing, so a baked
    ``q.astype(f32) * scale`` would constant-fold back into f32 constants and
    silently undo the quantization. Keeping them as inputs stages the
    dequantize into the program and lets the artifact ship them as a compact
    int8 ``weights.npz`` beside the StableHLO module.
    """

    def __init__(self, exported, weights):
        import jax

        self.exported = exported
        # commit the leaves to device once — numpy arguments would be
        # re-transferred host-to-device on EVERY call in a serving loop
        self.weights = [jax.device_put(w) for w in weights]

    @property
    def platforms(self):
        return self.exported.platforms

    @property
    def in_avals(self):
        return self.exported.in_avals  # [0] is the image input

    def call(self, x):
        return self.exported.call(x, self.weights)

    def serialize(self):
        return self.exported.serialize()


def _export_with_optional_quantization(make_forward, params, input_spec,
                                       platforms, quantize):
    """Shared plumbing: bake f32 params as constants, or thread a quantized
    leaf list through as a second program input."""
    import jax
    from jax import export as jax_export

    if quantize not in (None, "int8"):
        raise ValueError(f"unsupported quantization mode: {quantize}")
    if quantize is None:
        stored = jax.device_get(params)  # bake host copies, not tunnels
        forward = make_forward(lambda: stored)
        return jax_export.export(jax.jit(forward), platforms=tuple(platforms))(input_spec)

    qtree = quantize_params_int8(params)
    leaves, treedef = jax.tree_util.tree_flatten(qtree)

    def forward(x, qleaves):
        rebuilt = _dequantize_params(jax.tree_util.tree_unflatten(treedef, qleaves))
        return make_forward(lambda: rebuilt)(x)

    leaf_specs = [jax.ShapeDtypeStruct(l.shape, l.dtype) for l in leaves]
    exported = jax_export.export(jax.jit(forward), platforms=tuple(platforms))(
        input_spec, leaf_specs
    )
    return QuantizedExported(exported, leaves)


def export_sr_forward(
    state: Any,
    patch_size: int,
    batch_size: int,
    platforms: Sequence[str] = DEFAULT_PLATFORMS,
    quantize: Optional[str] = None,
):
    """Export the clipped SR restoration forward (LR tiles -> restored tiles)
    with ``state.params`` baked in as program constants.

    ``quantize="int8"`` ships conv kernels as int8 + per-channel scales
    (weight-only; dequantized inside the program — see QuantizedExported).
    The exported signature is
    ``f(tiles: f32[batch, patch, patch, 3]) -> f32[batch, patch, patch, 3]``.
    """
    import jax
    import jax.numpy as jnp

    apply_fn = state.apply_fn

    def make_forward(get_params):
        def forward(tiles):
            pred = apply_fn({"params": get_params()}, tiles)
            return jnp.clip(pred.astype(jnp.float32), 0.0, 1.0)

        return forward

    spec = jax.ShapeDtypeStruct((batch_size, patch_size, patch_size, 3), jnp.float32)
    return _export_with_optional_quantization(
        make_forward, state.params, spec, platforms, quantize
    )


def export_seg_forward(
    state: Any,
    image_size: int,
    batch_size: int,
    platforms: Sequence[str] = DEFAULT_PLATFORMS,
    quantize: Optional[str] = None,
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

    batch_stats = (
        jax.device_get(state.batch_stats) if state.batch_stats is not None else None
    )
    apply_fn = state.apply_fn

    def make_forward(get_params):
        def forward(images):
            variables = {"params": get_params()}
            if batch_stats is not None:
                variables["batch_stats"] = batch_stats
            return apply_fn(variables, images, train=False).astype(jnp.float32)

        return forward

    spec = jax.ShapeDtypeStruct((batch_size, image_size, image_size, 3), jnp.float32)
    return _export_with_optional_quantization(
        make_forward, state.params, spec, platforms, quantize
    )


def export_joint_forward(
    state: Any,
    image_size: int,
    batch_size: int,
    platforms: Sequence[str] = DEFAULT_PLATFORMS,
    quantize: Optional[str] = None,
):
    """Export the joint SR+seg forward: images -> {"sr": ..., "mask": ...}.

    Both heads ship in ONE program (shared encoder runs once); the exported
    signature is ``f(f32[b,s,s,3]) -> {"sr": f32[b,s,s,3], "mask": f32[b,s,s,C]}``.
    """
    import jax
    import jax.numpy as jnp

    apply_fn = state.apply_fn

    def make_forward(get_params):
        def forward(images):
            sr, mask = apply_fn({"params": get_params()}, images, train=False)
            return {
                "sr": jnp.clip(sr.astype(jnp.float32), 0.0, 1.0),
                "mask": mask.astype(jnp.float32),
            }

        return forward

    spec = jax.ShapeDtypeStruct((batch_size, image_size, image_size, 3), jnp.float32)
    return _export_with_optional_quantization(
        make_forward, state.params, spec, platforms, quantize
    )


def save_artifact(
    exported: Any,
    out_dir: str | Path,
    meta: Optional[Dict[str, Any]] = None,
) -> Path:
    """Serialize an ``Exported`` plus a manifest into ``out_dir``."""
    import jax

    import numpy as np

    out_dir = Path(out_dir).expanduser()
    out_dir.mkdir(parents=True, exist_ok=True)
    payload = exported.serialize()
    (out_dir / ARTIFACT_FILE).write_bytes(payload)

    total_bytes = len(payload)
    extra = {}
    if isinstance(exported, QuantizedExported):
        np.savez(out_dir / WEIGHTS_FILE,
                 **{f"w{i}": np.asarray(a) for i, a in enumerate(exported.weights)})
        extra["weights_file"] = WEIGHTS_FILE
        extra["weights_leaves"] = len(exported.weights)
        total_bytes += (out_dir / WEIGHTS_FILE).stat().st_size
    else:
        # re-exporting unquantized into a dir that previously held a
        # quantized artifact must not leave a stale weights file behind
        (out_dir / WEIGHTS_FILE).unlink(missing_ok=True)

    in_aval = exported.in_avals[0]
    manifest = {
        "format": "jax.export.stablehlo",
        "jax_version": jax.__version__,
        "platforms": list(exported.platforms),
        "input_shape": list(in_aval.shape),
        "input_dtype": str(in_aval.dtype),
        "artifact_bytes": total_bytes,
        **extra,
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
    import numpy as np
    from jax import export as jax_export

    path = Path(path).expanduser()
    if path.is_dir():
        base = path
        blob = (path / ARTIFACT_FILE).read_bytes()
    else:
        # Bare .stablehlo file: a --quantize export keeps its weights in a
        # sibling npz referenced by the manifest, so look for the manifest
        # next to the file instead of silently skipping it (ADVICE r2).
        base = path.parent
        blob = path.read_bytes()
    mf = base / MANIFEST_FILE
    manifest = json.loads(mf.read_text()) if mf.exists() else {}
    import jax

    exported = jax_export.deserialize(blob)
    if manifest.get("weights_file"):
        with np.load(base / manifest["weights_file"]) as z:
            # device-resident once; numpy leaves would re-transfer per call
            leaves = [jax.device_put(z[f"w{i}"])
                      for i in range(manifest["weights_leaves"])]
        return (lambda x: exported.call(x, leaves)), manifest
    if len(exported.in_avals) > 1:
        hint = (
            f"pass the export directory (with {MANIFEST_FILE} and the weights npz) "
            f"instead of the bare program file."
            if not path.is_dir()
            else f"the directory is missing {MANIFEST_FILE} (or its 'weights_file' "
            f"entry) — restore it from the original export."
        )
        raise ValueError(
            f"artifact at {path} expects {len(exported.in_avals)} inputs but no "
            f"manifest with a weights_file was found next to it — {hint}"
        )
    return exported.call, manifest
