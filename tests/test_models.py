"""Model structure tests: golden param counts, identity start, shapes.

Golden counts come from the reference's checked-in model summaries
(Super_resolution/experiments/experiment_2_adaptive_depth/model_summary/*.txt,
BASELINE.md): depth 1→520,003; 2→2,144,451; 3→8,637,379; 4→34,599,363;
5→138,427,843 params.

Everything runs under jax.jit — eager op-by-op dispatch compiles each conv
separately and is ~15x slower on the CPU test backend.
"""

from functools import partial

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adunet.models import (
    build_super_resolution_unet,
    VanillaSRUNet,
    build_adaptive_depth_unet,
    VanillaSegUNet,
)


def _n_params(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


GOLDEN_PARAMS = {1: 520_003, 2: 2_144_451, 3: 8_637_379, 4: 34_599_363, 5: 138_427_843}


@pytest.mark.parametrize("depth", [1, 2, 3, 4, 5])
def test_adaptive_sr_param_counts_match_reference(depth):
    model, info = build_super_resolution_unet(scale=0.5, depth_override=depth, input_size=32)
    shapes = jax.eval_shape(model.init, jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    assert info["depth"] == depth
    assert _n_params(shapes["params"]) == GOLDEN_PARAMS[depth]


def test_adaptive_sr_identity_start():
    """Zero-init residual head → output == clip(input) at init
    (train_adaptive_unet.py:264-276)."""
    model, _ = build_super_resolution_unet(scale=0.5, depth_override=2, input_size=32)
    x = jax.random.uniform(jax.random.key(1), (2, 32, 32, 3))
    variables = jax.jit(model.init)(jax.random.key(0), x)
    y = jax.jit(model.apply)(variables, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(jnp.clip(x, 0, 1)), atol=1e-6)


def test_adaptive_sr_shapes_and_range():
    model, info = build_super_resolution_unet(scale=0.3, input_size=64)
    x = jax.random.uniform(jax.random.key(1), (2, 64, 64, 3))
    variables = jax.jit(model.init)(jax.random.key(0), x)
    y = jax.jit(model.apply)(variables, x)
    assert y.shape == x.shape
    assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0
    # custom_depth_from_scale(0.3, base_resolution=64): ceil(64*0.3)=20 < 21 → depth 1
    assert info["depth"] == 1


def test_adaptive_sr_bf16_compute():
    model, _ = build_super_resolution_unet(
        scale=0.5, depth_override=2, input_size=32, dtype=jnp.bfloat16
    )
    x = jax.random.uniform(jax.random.key(1), (1, 32, 32, 3))
    variables = jax.jit(model.init)(jax.random.key(0), x)
    y = jax.jit(model.apply)(variables, x)
    assert y.dtype == jnp.float32  # head returns f32
    assert all(p.dtype == jnp.float32 for p in jax.tree_util.tree_leaves(variables["params"]))


def test_adaptive_sr_remat_matches(perturb_params):
    model, _ = build_super_resolution_unet(scale=0.5, depth_override=2, input_size=32)
    model_r, _ = build_super_resolution_unet(scale=0.5, depth_override=2, input_size=32, remat=True)
    x = jax.random.uniform(jax.random.key(1), (1, 32, 32, 3))
    v = jax.jit(model.init)(jax.random.key(0), x)
    # identity-start would make both outputs clip(x) regardless of the
    # encoder/decoder path — perturb so the comparison exercises the net
    v = {"params": perturb_params(v["params"])}
    y = jax.jit(model.apply)(v, x)
    y_r = jax.jit(model_r.apply)(v, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_r), atol=1e-6)


def test_vanilla_sr_unet():
    model = VanillaSRUNet(base_channels=16)
    x = jax.random.uniform(jax.random.key(1), (1, 64, 64, 3))
    variables = jax.jit(partial(model.init, train=False))(jax.random.key(0), x)
    assert "batch_stats" in variables
    y, mutated = jax.jit(partial(model.apply, train=True, mutable=["batch_stats"]))(variables, x)
    assert y.shape == x.shape
    assert "batch_stats" in mutated
    assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0


def test_adaptive_seg_unet():
    model = build_adaptive_depth_unet(input_size=64, base_channels=16, depth=3)
    x = jax.random.uniform(jax.random.key(1), (2, 64, 64, 3))
    variables = jax.jit(partial(model.init, train=False))(jax.random.key(0), x)
    y = jax.jit(partial(model.apply, train=False))(variables, x)
    assert y.shape == (2, 64, 64, 1)
    assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0


def test_vanilla_seg_unet_binary_and_multiclass():
    x = jax.random.uniform(jax.random.key(1), (1, 32, 32, 3))
    m1 = VanillaSegUNet(num_classes=1, base_channels=8, depth=2)
    v1 = jax.jit(m1.init)(jax.random.key(0), x)
    assert jax.jit(m1.apply)(v1, x).shape == (1, 32, 32, 1)

    m3 = VanillaSegUNet(num_classes=3, base_channels=8, depth=2)
    v3 = jax.jit(m3.init)(jax.random.key(0), x)
    y3 = jax.jit(m3.apply)(v3, x)
    assert y3.shape == (1, 32, 32, 3)
    np.testing.assert_allclose(np.asarray(y3.sum(-1)), 1.0, atol=1e-5)


def test_selective_remat_identical_math_and_params(perturb_params):
    """remat_levels must be a pure memory/compute knob: same param tree, same
    forward outputs, same gradients as the stored-activation model."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from adunet.models import build_super_resolution_unet

    x = jnp.asarray(np.random.default_rng(0).random((2, 32, 32, 3), dtype=np.float32))
    variants = {}
    for tag, kw in {
        "none": dict(remat=False),
        "all": dict(remat=True),
        "sel2": dict(remat_levels=2),
        "sel0": dict(remat_levels=0),
    }.items():
        model, _ = build_super_resolution_unet(
            scale=0.5, depth_override=3, input_size=32, base_channels=8, **kw
        )
        variables = model.init(jax.random.key(7), x)
        # identity-start zeroes every gradient upstream of the residual head,
        # which would reduce this equivalence check to comparing zeros
        params = perturb_params(variables["params"])

        def loss(p, m=model):
            return jnp.mean(jnp.square(m.apply({"params": p}, x)))

        g = jax.jit(jax.grad(loss))(params)
        variants[tag] = (params, jax.tree_util.tree_leaves(g))

    ref_params, ref_grads = variants["none"]
    # the comparison below must not be over zeros: after perturbation every
    # parameter influences the output, so every gradient leaf is live
    assert all(float(np.abs(np.asarray(g)).max()) > 0 for g in ref_grads)
    for tag, (params, grads) in variants.items():
        assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(ref_params), tag
        for a, b in zip(grads, ref_grads):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, err_msg=tag)
