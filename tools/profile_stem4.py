"""Halo-tiled full-res conv: exactness + cost."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/rife_tpu_jit_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
import numpy as np
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

def conv_tiled(x, w, s, T=16):
    """3x3 pad-1 stride-s conv with H folded into batch via halo tiles."""
    n, h, wd, c = x.shape
    oh = h // s
    nt = -(-oh // T)
    xp = jnp.pad(x, ((0, 0), (1, 1 + (nt * T * s - h)), (0, 0), (0, 0)))
    in_rows = s * T + (3 - s)
    tiles = jnp.stack([xp[:, t * T * s : t * T * s + in_rows] for t in range(nt)], 1)
    tiles = tiles.reshape(n * nt, in_rows, wd, c)
    y = lax.conv_general_dilated(
        tiles, w, (s, s), ((0, 0), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)
    y = y.reshape(n, nt * T, wd // s, w.shape[-1])
    return y[:, :oh]

x17 = jax.random.uniform(key, (B, H, W, 17), DT)
w1 = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 17, 45), DT) * 0.1

# exactness
a = jax.jit(lambda x: conv_ref(x, w1, 2))(x17)
b = jax.jit(lambda x: conv_tiled(x, w1, 2))(x17)
print("s2 maxdiff:", float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))))
a = jax.jit(lambda x: conv_ref(x, w1, 1))(x17)
b = jax.jit(lambda x: conv_tiled(x, w1, 1))(x17)
print("s1 maxdiff:", float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))))

bench("tiled s2 17->45 @full", loopify(lambda x: conv_tiled(x, w1, 2), x17), x17)
bench("tiled s1 17->45 @full", loopify(lambda x: conv_tiled(x, w1, 1), x17), x17)
bench("tiled s2 T=32", loopify(lambda x: conv_tiled(x, w1, 2, T=32), x17), x17)
bench("tiled s2 T=8", loopify(lambda x: conv_tiled(x, w1, 2, T=8), x17), x17)

# 3-channel contextnet-like conv
x3 = jax.random.uniform(key, (B, H, W, 3), DT)
w3 = jax.random.normal(jax.random.PRNGKey(3), (3, 3, 3, 16), DT) * 0.1
bench("ctx conv 3->16 s2 @full (ref)", loopify(lambda x: conv_ref(x, w3, 2), x3), x3)
bench("ctx conv 3->16 s2 @full tiled", loopify(lambda x: conv_tiled(x, w3, 2), x3), x3)

# 17ch at 1/2 res (block1 stem)
x17h = jax.random.uniform(key, (B, H//2, W//2, 17), DT)
bench("conv 17->45 s2 @1/2 (ref)", loopify(lambda x: conv_ref(x, w1, 2), x17h), x17h)
bench("conv 17->45 s2 @1/2 tiled", loopify(lambda x: conv_tiled(x, w1, 2), x17h), x17h)
