import time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from adunet.kernels.conv64 import conv3x3_same_pallas
print(jax.devices(), flush=True)
dt = jnp.bfloat16
key = jax.random.key(0)
B, H, W, C = 32, 256, 256, 64
x = jax.random.normal(key, (B, H, W, C), dt)
w = jax.random.normal(key, (3, 3, C, C), dt) * 0.05
bias = jnp.zeros((64,), dt)
fl = 2 * B*H*W * 9 * C * C
SHORT, LONG = 5, 55

def timeit(conv_fn):
    def make_run(length):
        @jax.jit
        def run(x, w):
            def body(carry, _):
                x, w = carry
                o = conv_fn(x, w)
                upd = (1e-12 * o.astype(jnp.float32).sum(axis=(0,1,2)))[None,None,None,:].astype(dt)
                return (x, w + upd), None
            out, _ = lax.scan(body, (x, w), None, length=length)
            return out
        return run
    rs, rl = make_run(SHORT), make_run(LONG)
    def sync(o): np.asarray(jax.device_get(o[1])).ravel()[0]
    sync(rs(x, w)); sync(rl(x, w))
    ts = min((lambda t0: (sync(rs(x, w)), time.perf_counter()-t0)[1])(time.perf_counter()) for _ in range(3))
    tl = min((lambda t0: (sync(rl(x, w)), time.perf_counter()-t0)[1])(time.perf_counter()) for _ in range(3))
    return (tl - ts) / (LONG - SHORT) * 1e3

def xla_conv(x, w):
    return lax.conv_general_dilated(x, w, (1,1), "SAME",
        dimension_numbers=("NHWC","HWIO","NHWC"), preferred_element_type=jnp.float32).astype(dt)

t = timeit(xla_conv)
print(f"xla conv: {t:.3f} ms {fl/t/1e9:.1f} TF/s ({fl/t/1e9/197*100:.0f}%)", flush=True)
for bh in (8, 16, 32):
    fn = lambda x, w, bh=bh: conv3x3_same_pallas(x, w, bias, block_h=bh)
    t = timeit(fn)
    print(f"pallas bh={bh}: {t:.3f} ms {fl/t/1e9:.1f} TF/s ({fl/t/1e9/197*100:.0f}%)", flush=True)
