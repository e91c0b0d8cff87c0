"""Concat-based halo build for the tiled conv."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/rife_tpu_jit_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from jax import lax

B, H, W = 4, 736, 1280
K = 10
DT = jnp.bfloat16
key = jax.random.PRNGKey(0)

def bench(name, fn, *args, reps=3):
    try:
        float(jnp.sum(fn(*args)))
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            float(jnp.sum(fn(*args)))
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {(best*1000-31)/K:.2f} ms/op net", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__} {str(e)[:150]}", flush=True)

def loopify(f, x):
    @jax.jit
    def g(x):
        def body(i, x):
            return x + jnp.mean(f(x)).astype(x.dtype)
        return lax.fori_loop(0, K, body, x)
    return g

def conv_ref(x, w, s):
    return lax.conv_general_dilated(
        x, w, (s, s), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)

def conv_tiled2(x, w, s, T=16):
    """3x3 pad-1 stride-s conv, H folded to batch; halos via one concat."""
    n, h, wd, c = x.shape
    oh = -(-h // s)
    nt = -(-oh // T)
    hh = nt * T * s
    x = jnp.pad(x, ((0, 0), (0, hh - h), (0, 0), (0, 0))) if hh != h else x
    Ti = T * s
    mid = x.reshape(n, nt, Ti, wd, c)
    # top halo row(s) of tile t = last row(s) of tile t-1 (zero for t=0)
    top = jnp.pad(mid[:, :-1, Ti - 1:], ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0)))
    # bottom halo = first (3 - s - 1) row(s) of tile t+1
    nb = 3 - s - 1  # s=2 -> 0 extra needed? window 3, stride s, pad 1
    # rows needed by tile t outputs: [Ti*t - 1, Ti*t + Ti - 2 + 2] = Ti+2 rows
    bot = jnp.pad(mid[:, 1:, :2 - s + 1], ((0, 0), (0, 1), (0, 0), (0, 0), (0, 0)))
    tiles = jnp.concatenate([top, mid, bot], axis=2)
    tiles = tiles.reshape(n * nt, Ti + 1 + (2 - s + 1), wd, c)
    y = lax.conv_general_dilated(
        tiles, w, (s, s), ((0, 0), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)
    y = y.reshape(n, -1, wd // s if s == 2 else wd, w.shape[-1])
    return y[:, :h // s if s == 2 else h]

x17 = jax.random.uniform(key, (B, H, W, 17), DT)
w1 = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 17, 45), DT) * 0.1

a = jax.jit(lambda x: conv_ref(x, w1, 2))(x17)
b = jax.jit(lambda x: conv_tiled2(x, w1, 2))(x17)
print("s2 maxdiff:", float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))), a.shape, b.shape)
a = jax.jit(lambda x: conv_ref(x, w1, 1))(x17)
b = jax.jit(lambda x: conv_tiled2(x, w1, 1))(x17)
print("s1 maxdiff:", float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))), a.shape, b.shape)

bench("tiled2 s2 17->45 @full", loopify(lambda x: conv_tiled2(x, w1, 2), x17), x17)
bench("tiled2 s1 17->45 @full", loopify(lambda x: conv_tiled2(x, w1, 1), x17), x17)
bench("tiled2 s2 T=8", loopify(lambda x: conv_tiled2(x, w1, 2, T=8), x17), x17)
bench("tiled2 s2 T=32", loopify(lambda x: conv_tiled2(x, w1, 2, T=32), x17), x17)
