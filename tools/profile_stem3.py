"""Which axis/layout makes small-C full-res conv slow?"""
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
        print(f"{name}: FAILED {type(e).__name__} {str(e)[:120]}", flush=True)

def loopify(f, x):
    @jax.jit
    def g(x):
        def body(i, x):
            return x + jnp.mean(f(x)).astype(x.dtype)
        return lax.fori_loop(0, K, body, x)
    return g

x17 = jax.random.uniform(key, (B, H, W, 17), DT)
w1 = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 17, 45), DT) * 0.1

def convhw(x, w, sh, sw):
    return lax.conv_general_dilated(
        x, w, (sh, sw), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)

bench("conv1 sH2 sW1 @full", loopify(lambda x: convhw(x, w1, 2, 1), x17), x17)
bench("conv1 sH1 sW2 @full", loopify(lambda x: convhw(x, w1, 1, 2), x17), x17)

# NCHW dimension numbers
x17c = jnp.moveaxis(x17, -1, 1)
w1c = jnp.moveaxis(w1, (0,1,2,3), (2,3,1,0))  # OIHW
def convnchw(x, w, s):
    return lax.conv_general_dilated(
        x, w, (s, s), ((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32).astype(x.dtype)
bench("conv1 s2 NCHW @full", loopify(lambda x: convnchw(x17c, w1c, 2), x17c), x17c)
bench("conv1 s1 NCHW @full", loopify(lambda x: convnchw(x17c, w1c, 1), x17c), x17c)

# fold H into batch? (B, H, W, C) -> (B*46, 16, W, C) tiles: conv with pad across tiles wrong at edges; perf probe only
x17t = x17.reshape(B*46, 16, W, 17)
bench("conv1 s2 tiledH @full", loopify(lambda x: convhw(x17t, w1, 2, 2), x17t), x17t)

# feature-group trick: 2x2 space-to-depth input, 1 conv stride-1 with rearranged weights (s2d via reshape+transpose)
def s2d(x):
    n,h,w,c = x.shape
    y = x.reshape(n, h//2, 2, w//2, 2, c)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(n, h//2, w//2, 4*c)
def conv_s2d(x):
    xp = jnp.pad(x, ((0,0),(2,0),(2,0),(0,0)))[:, :-1, :-1, :]  # shift so 3x3/s2/p1 aligns to 2x2 window
    xs = s2d(jnp.pad(x, ((0,0),(1,1),(1,1),(0,0))))
    return xs  # placeholder: just measure s2d cost
bench("s2d relayout cost only", loopify(lambda x: s2d(x), x17), x17)
