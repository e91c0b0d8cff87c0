"""Resize lowering variants: can we beat reduce_window (56 GB/s) in XLA?

2x2-mean downsample is pure HBM traffic (~0.35 ms at roofline for 17ch
720p b4) but measures 2.3 ms.  Try channel-fold reshapes that turn the
lane-pair reduction into a channel-half add.
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/rife_tpu_jit_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from jax import lax
from rife_tpu.ops import resize_bilinear

K = 30
B, H, W, C = 4, 736, 1280, 17
x17 = jax.random.uniform(jax.random.PRNGKey(0), (B, H, W, C), jnp.bfloat16)

def bench(name, fn, *args):
    @jax.jit
    def loop(a):
        def body(i, a):
            return a + jnp.mean(fn(a)).astype(a.dtype)
        return jnp.mean(lax.fori_loop(0, K, body, a))
    t0 = time.perf_counter(); float(loop(*args))
    print(f"  [{name} compile {time.perf_counter()-t0:.0f}s]", flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); float(loop(*args)); best = min(best, time.perf_counter()-t0)
    print(f"{name}: {best*1000/K:.2f} ms", flush=True)

def rw(x):
    y = lax.reduce_window(x, jnp.zeros((), x.dtype), lax.add,
                          window_dimensions=(1, 2, 2, 1), window_strides=(1, 2, 2, 1),
                          padding="VALID")
    return y * jnp.asarray(0.25, x.dtype)
bench("reduce_window (current)", rw, x17)

def wfold_hfold(x):
    n, h, w, c = x.shape
    a = x.reshape(n, h, w // 2, 2 * c)
    a = a[..., :c] + a[..., c:]            # lane-pair add via channel halves
    a = a.reshape(n, h // 2, 2, w // 2, c)
    a = a[:, :, 0] + a[:, :, 1]            # row-pair add via sublane index
    return a * jnp.asarray(0.25, x.dtype)
bench("w-fold + h-index", wfold_hfold, x17)

def wfold_rw(x):
    n, h, w, c = x.shape
    a = x.reshape(n, h, w // 2, 2 * c)
    a = a[..., :c] + a[..., c:]
    y = lax.reduce_window(a, jnp.zeros((), x.dtype), lax.add,
                          window_dimensions=(1, 2, 1, 1), window_strides=(1, 2, 1, 1),
                          padding="VALID")
    return y * jnp.asarray(0.25, x.dtype)
bench("w-fold + h-reduce_window", wfold_rw, x17)

def hbatchfold(x):
    # fold h-pairs into batch (H-tiling spirit), reduce lanes via channel fold
    n, h, w, c = x.shape
    a = x.reshape(n * (h // 2), 2, w, c)
    a = a[:, 0] + a[:, 1]
    a = a.reshape(n * (h // 2), w // 2, 2 * c)
    a = a[..., :c] + a[..., c:]
    return (a * jnp.asarray(0.25, x.dtype)).reshape(n, h // 2, w // 2, c)
bench("h-batch-fold + w-fold", hbatchfold, x17)

# x8 upsample variants for the 5ch flow/mask head
x5 = jax.random.uniform(jax.random.PRNGKey(1), (B, H // 8, W // 8, 5), jnp.bfloat16)
bench("x8 up gather-lerp (current)", lambda a: resize_bilinear(a, (H, W)), x5)

def up8_rep_then_lerp(a):
    # nearest x8 via broadcast, then 2-tap correction? (approximation test only
    # for speed ceiling: NOT exact, do not ship)
    n, h, w, c = a.shape
    y = jnp.broadcast_to(a[:, :, None, :, None, :], (n, h, 8, w, 8, c))
    return y.reshape(n, h * 8, w * 8, c)
bench("x8 nearest (speed ceiling)", up8_rep_then_lerp, x5)
print("done", flush=True)
