"""Bisect: where does the windowed DCN's 3.6x go inside the fused step?

Stages:
  A  bare op, exact gather path
  B  bare op, windowed D=8
  C  3 chained bare windowed ops (dependent data)
  D  DCNAlign module (convs + heads + op), exact vs windowed
  E  3 chained DCNAlign stages, exact vs windowed
"""
import time
import jax, jax.numpy as jnp
import numpy as np

from crfp_tpu.bench.profile import timed
from crfp_tpu.ops.dcn import deform_conv2d
from crfp_tpu.ops.dcn_windowed import deform_conv2d_windowed
from crfp_tpu.nn.align import DCNAlign

print("backend:", jax.default_backend(), flush=True)

N, H, W, C, G, K2 = 1, 180, 320, 32, 8, 9
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((N, H, W, C)), jnp.float32)
off = jnp.asarray(rng.uniform(-6, 6, (N, H, W, G, K2, 2)), jnp.float32)
mk = jnp.asarray(rng.uniform(0, 1, (N, H, W, G, K2)), jnp.float32)
wt = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.1, jnp.float32)
b = jnp.zeros((C,), jnp.float32)

exact = jax.jit(lambda x, o, m: deform_conv2d(x, o, m, wt, b))
win = jax.jit(lambda x, o, m: deform_conv2d_windowed(
    x, o, m, wt, b, max_displacement=8, band=8, xtile=32))

_, tA = timed(exact, x, off, mk)
print(f"A exact bare        : {tA*1e3:8.1f} ms", flush=True)
_, tB = timed(win, x, off, mk)
print(f"B windowed bare     : {tB*1e3:8.1f} ms", flush=True)

def chain3(f):
    def g(x, o, m):
        for _ in range(3):
            x = f(x, o, m)
        return x
    return jax.jit(g)

_, tC = timed(chain3(lambda x, o, m: deform_conv2d_windowed(
    x, o, m, wt, b, max_displacement=8, band=8, xtile=32)), x, off, mk)
print(f"C 3x chained window : {tC*1e3:8.1f} ms  (3x bare = {3*tB*1e3:.1f})", flush=True)
_, tC2 = timed(chain3(lambda x, o, m: deform_conv2d(x, o, m, wt, b)), x, off, mk)
print(f"C2 3x chained exact : {tC2*1e3:8.1f} ms  (3x bare = {3*tA*1e3:.1f})", flush=True)

# D: full DCNAlign module
flow = jnp.asarray(rng.uniform(-4, 4, (N, H, W, 2)), jnp.float32)
for name, winsz in [("exact", None), ("win8 ", 8)]:
    mod = DCNAlign(C, G, 3, 10.0, window=winsz)
    params = jax.jit(mod.init)(jax.random.key(0), x, x, x, flow)
    app = jax.jit(lambda p, a, b_, c, f: mod.apply(p, a, b_, c, f))
    _, tD = timed(app, params, x, x, x, flow)
    print(f"D align module {name}: {tD*1e3:8.1f} ms", flush=True)

    def chain(p, a, b_, c, f):
        for _ in range(3):
            a2, _ = mod.apply(p, a, b_, c, f)
            a = a2
        return a
    appc = jax.jit(chain)
    _, tE = timed(appc, params, x, x, x, flow)
    print(f"E 3x align    {name}: {tE*1e3:8.1f} ms", flush=True)
