"""Round-3 experiment 7 (TPU): conv MFU at the exact 720p b4 model
shapes — plain XLA conv vs H-tiled vs explicit im2col matmul, plus the
8-conv convblock chain.  Decides whether a Pallas conv path is worth
building or whether a better XLA formulation closes the gap.
"""
import os, sys, time, functools
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from jax import lax

from rife_tpu.nn import tiled as _tiled
from rife_tpu.nn.layers import use_conv_tiling

print("backend:", jax.default_backend(), flush=True)
B = 4
ITERS = 30
DN = ("NHWC", "HWIO", "NHWC")


def bench(name, fn, *args, macs=None):
    @jax.jit
    def chained(*a):
        def body(i, c):
            out = fn(a[0] + (c * 1e-20).astype(a[0].dtype), *a[1:])
            return jnp.sum(out.astype(jnp.float32)) * 1e-20
        return lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))
    try:
        t0 = time.perf_counter()
        float(chained(*args))
        comp = time.perf_counter() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(chained(*args))
            best = min(best, time.perf_counter() - t0)
        ms = best / ITERS * 1e3
        tf = (2 * macs / (best / ITERS)) / 1e12 if macs else 0
        print(f"{name}: {ms:.3f} ms  {tf:.0f} TF/s  (compile {comp:.0f}s)", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)


def conv_plain(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=DN,
        preferred_element_type=x.dtype)


def conv_im2col(x, w):
    n, h, wd, c = x.shape
    co = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = [xp[:, dy:dy + h, dx:dx + wd, :] for dy in range(3) for dx in range(3)]
    patches = jnp.concatenate(cols, axis=-1)          # (n, h, w, 9c)
    wm = w.reshape(9 * c, co)
    return jax.lax.dot_general(
        patches.reshape(n * h * wd, 9 * c), wm,
        (((1,), (0,)), ((), ())),
        preferred_element_type=x.dtype).reshape(n, h, wd, co)


key = jax.random.PRNGKey(0)
shapes = [
    ("convblock c240 46x80", (B, 46, 80, 240)),
    ("convblock c150 92x160", (B, 92, 160, 150)),
    ("convblock c90 184x320", (B, 184, 320, 90)),
    ("unet down1b c64 184x320", (B, 184, 320, 64)),
    ("unet down2b c128 92x160", (B, 92, 160, 128)),
]
for name, shp in shapes:
    c = shp[-1]
    x = jax.random.uniform(key, shp, jnp.bfloat16)
    w = jax.random.uniform(key, (3, 3, c, c), jnp.bfloat16) * 0.1
    macs = shp[0] * shp[1] * shp[2] * c * c * 9
    bench(f"{name} plain", conv_plain, x, w, macs=macs)
    bench(f"{name} im2col", conv_im2col, x, w, macs=macs)


# the full 8-conv chain at block0 shape, with prelu between
def chain8(x, w, alpha):
    y = x
    for i in range(8):
        y = conv_plain(y, w)
        y = jnp.where(y >= 0, y, alpha * y)
    return y + x


def chain8_im2col(x, w, alpha):
    y = x
    for i in range(8):
        y = conv_im2col(y, w)
        y = jnp.where(y >= 0, y, alpha * y)
    return y + x


for name, shp in shapes[:3]:
    c = shp[-1]
    x = jax.random.uniform(key, shp, jnp.bfloat16)
    w = jax.random.uniform(key, (3, 3, c, c), jnp.bfloat16) * 0.05
    alpha = jnp.asarray(0.1, jnp.bfloat16)
    macs = 8 * shp[0] * shp[1] * shp[2] * c * c * 9
    bench(f"chain8 {name} plain", chain8, x, w, alpha, macs=macs)
    bench(f"chain8 {name} im2col", chain8_im2col, x, w, alpha, macs=macs)

# stem / final shapes through the current dispatch (tiled)
stems = [
    ("block2 conv0a 21->45 s2 @736x1280", (B, 736, 1280, 21), 45, 2),
    ("unet finale 16->3 s1 @736x1280", (B, 736, 1280, 16), 3, 1),
    ("unet down0a 17->32 s2 @736x1280", (B, 736, 1280, 17), 32, 2),
]
for name, shp, co, s in stems:
    c = shp[-1]
    x = jax.random.uniform(key, shp, jnp.bfloat16)
    w = jax.random.uniform(key, (3, 3, c, co), jnp.bfloat16) * 0.1
    macs = shp[0] * (shp[1] // s) * (shp[2] // s) * c * co * 9

    def conv_s(x, w, s=s):
        return lax.conv_general_dilated(
            x, w, (s, s), ((1, 1), (1, 1)), dimension_numbers=DN,
            preferred_element_type=x.dtype)

    def conv_tiled(x, w, s=s):
        return _tiled.conv2d_tiled(x, w, s, lax.Precision.DEFAULT)

    bench(f"{name} plain", conv_s, x, w, macs=macs)
    bench(f"{name} tiled", conv_tiled, x, w, macs=macs)

print("done", flush=True)
