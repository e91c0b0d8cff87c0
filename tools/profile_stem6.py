"""Boundary-fixup tiled conv v2 (no scatter)."""
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
    float(jnp.sum(fn(*args)))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jnp.sum(fn(*args)))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {(best*1000-31)/K:.2f} ms/op net", flush=True)

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

def conv_fixup(x, w, s=2, T=16):
    n, h, wd, c = x.shape
    Ti = T * s
    nt = h // Ti
    co = w.shape[-1]
    tiles = x.reshape(n * nt, Ti, wd, c)
    y = lax.conv_general_dilated(
        tiles, w, (s, s), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)
    y = y.reshape(n, nt, T, wd // s, co)
    xt = x.reshape(n, nt, Ti, wd, c)
    toprows = xt[:, :, Ti - 1]  # (n, nt, wd, c); tile t feeds tile t+1
    fix = lax.conv_general_dilated(
        toprows.reshape(n * nt, 1, wd, c), w[0:1], (1, s), ((0, 0), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)
    fix = fix.reshape(n, nt, 1, wd // s, co)
    fix = jnp.pad(fix[:, :-1], ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0)))
    row0 = y[:, :, 0:1] + fix
    y = jnp.concatenate([row0, y[:, :, 1:]], axis=2)
    return y.reshape(n, nt * T, wd // s, co)

x17 = jax.random.uniform(key, (B, H, W, 17), DT)
w1 = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 17, 45), DT) * 0.1

a = jax.jit(lambda x: conv_ref(x, w1, 2))(x17)
b = jax.jit(lambda x: conv_fixup(x, w1, 2))(x17)
print("s2 maxdiff:", float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))))
bench("fixup s2 17->45 @full", loopify(lambda x: conv_fixup(x, w1, 2), x17), x17)
