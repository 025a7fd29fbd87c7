import time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
print(jax.devices(), flush=True)
from adunet.losses import build_losses_and_metrics
from adunet.models import build_super_resolution_unet
from adunet.train import create_train_state, make_optimizer
from adunet.train.sr import DATA_LR_SHRINK, sr_loss_and_metrics
from adunet.ops import degrade

loss_fn, _ = build_losses_and_metrics("charbonnier")
model, info = build_super_resolution_unet(scale=0.7, depth_override=5, input_size=256,
                                          dtype=jnp.bfloat16, remat=True)
state = create_train_state(model, jax.random.key(0), jnp.zeros((1,256,256,3)), make_optimizer(1e-4))
n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(state.params))
print("params:", n, flush=True)

def make_runner(n_steps, bs):
    @jax.jit
    def run(state, rng):
        def body(carry, _):
            st, key = carry
            key, sub = jax.random.split(key)
            hr = jax.random.uniform(sub, (bs,256,256,3), jnp.float32)
            lr = degrade(hr, DATA_LR_SHRINK, 256)
            def c(p):
                pred = st.apply_fn({"params": p}, lr)
                l, _m = sr_loss_and_metrics(loss_fn, hr, pred)
                return l
            l, g = jax.value_and_grad(c)(st.params)
            return (st.apply_gradients(grads=g), key), l
        (state, _), losses = lax.scan(body, (state, rng), None, length=n_steps)
        return state, losses
    return run

def timed(run, state, rng):
    _, losses = run(state, rng); float(np.asarray(losses).sum())
    best = np.inf
    for _ in range(2):
        t0 = time.perf_counter()
        _, losses = run(state, rng)
        assert np.isfinite(float(np.asarray(losses).sum()))
        best = min(best, time.perf_counter()-t0)
    return best

for bs in (8, 16):
    try:
        t5 = timed(make_runner(3, bs), state, jax.random.key(1))
        t25 = timed(make_runner(13, bs), state, jax.random.key(1))
        ms = (t25 - t5)/10*1e3
        print(f"depth5 bs{bs}: {ms:.0f} ms/step -> {bs/((t25-t5)/10):.1f} img/s", flush=True)
    except Exception as e:
        print(f"depth5 bs{bs}: failed {str(e)[:120]}", flush=True)
