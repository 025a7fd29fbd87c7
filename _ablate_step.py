"""Localize the flagship step's time: fwd vs bwd vs LN vs resize."""
import time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
print(jax.devices(), flush=True)

from adunet.losses import build_losses_and_metrics
from adunet.models import build_super_resolution_unet
from adunet.models.sr_adaptive import AdaptiveSRUNet
from adunet.train import create_train_state, make_optimizer
from adunet.train.sr import DATA_LR_SHRINK, sr_loss_and_metrics
from adunet.ops import degrade

loss_fn, _ = build_losses_and_metrics("charbonnier")
BS = 32

def timed_scan(make_body, init, n_short=5, n_long=25):
    def runner(length):
        @jax.jit
        def run(carry):
            out, _ = lax.scan(make_body(), carry, None, length=length)
            return out
        return run
    rs, rl = runner(n_short), runner(n_long)
    def sync(o): np.asarray(jax.device_get(jax.tree_util.tree_leaves(o)[0])).ravel()[0]
    sync(rs(init)); sync(rl(init))
    ts = min((lambda t0: (sync(rs(init)), time.perf_counter()-t0)[1])(time.perf_counter()) for _ in range(2))
    tl = min((lambda t0: (sync(rl(init)), time.perf_counter()-t0)[1])(time.perf_counter()) for _ in range(2))
    return (tl - ts) / (n_long - n_short) * 1e3

def build(pool_resize=False, no_norm=False):
    model, _ = build_super_resolution_unet(scale=0.5, depth_override=3, input_size=256, dtype=jnp.bfloat16)
    if no_norm:
        import adunet.nn.blocks as B
        model = AdaptiveSRUNet(scale=0.5, depth=3, dtype=jnp.bfloat16)
    return model

model = build()
state = create_train_state(model, jax.random.key(0), jnp.zeros((1,256,256,3)), make_optimizer(1e-4))

# 1. full step
def make_full():
    def body(carry, _):
        st, key = carry
        key, sub = jax.random.split(key)
        hr = jax.random.uniform(sub, (BS,256,256,3), jnp.float32)
        lr = degrade(hr, DATA_LR_SHRINK, 256)
        def c(p):
            pred = st.apply_fn({"params": p}, lr)
            l, _m = sr_loss_and_metrics(loss_fn, hr, pred)
            return l
        l, g = jax.value_and_grad(c)(st.params)
        return (st.apply_gradients(grads=g), key), None
    return body
t = timed_scan(make_full, (state, jax.random.key(1)))
print(f"full step: {t:.1f} ms", flush=True)

# 2. fwd+bwd, no Adam (grads folded into params with tiny axpy)
def make_fwdbwd():
    def body(carry, _):
        params, key = carry
        key, sub = jax.random.split(key)
        hr = jax.random.uniform(sub, (BS,256,256,3), jnp.float32)
        lr = degrade(hr, DATA_LR_SHRINK, 256)
        def c(p):
            pred = state.apply_fn({"params": p}, lr)
            l, _m = sr_loss_and_metrics(loss_fn, hr, pred)
            return l
        l, g = jax.value_and_grad(c)(params)
        new = jax.tree_util.tree_map(lambda p, gg: p + 1e-12*gg, params, g)
        return (new, key), None
    return body
t = timed_scan(make_fwdbwd, (state.params, jax.random.key(1)))
print(f"fwd+bwd (no Adam): {t:.1f} ms", flush=True)

# 3. fwd only (loss feedback into one param)
def make_fwd():
    def body(carry, _):
        params, key = carry
        key, sub = jax.random.split(key)
        hr = jax.random.uniform(sub, (BS,256,256,3), jnp.float32)
        lr = degrade(hr, DATA_LR_SHRINK, 256)
        pred = state.apply_fn({"params": params}, lr)
        l, _m = sr_loss_and_metrics(loss_fn, hr, pred)
        params = jax.tree_util.tree_map(lambda p: p + 1e-12*l.astype(p.dtype), params)
        return (params, key), None
    return body
t = timed_scan(make_fwd, (state.params, jax.random.key(1)))
print(f"fwd only: {t:.1f} ms", flush=True)

# 4. degrade only (isolate on-device data synthesis cost)
def make_degrade():
    def body(carry, _):
        acc, key = carry
        key, sub = jax.random.split(key)
        hr = jax.random.uniform(sub, (BS,256,256,3), jnp.float32)
        lr = degrade(hr, DATA_LR_SHRINK, 256)
        return (acc + lr.sum(), key), None
    return body
t = timed_scan(make_degrade, (jnp.float32(0), jax.random.key(1)))
print(f"degrade+prng only: {t:.1f} ms", flush=True)
