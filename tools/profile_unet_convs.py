"""Size the unet conv/deconv costs at 720p batch 4."""
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

def deconv(x, w, pad=2):  # k4 s2 torch-pad-1 pre-flipped form
    return lax.conv_general_dilated(
        x, w, (1, 1), ((pad, pad), (pad, pad)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)

# up3: 64 -> 16, 1/2 -> full
x64 = jax.random.uniform(key, (B, H//2, W//2, 64), DT)
w_up3 = jax.random.normal(jax.random.PRNGKey(1), (4, 4, 64, 16), DT) * 0.1
bench("unet up3 deconv 64->16 @1/2->full", loopify(lambda x: deconv(x, w_up3), x64), x64)

# up2: 128 -> 32, 1/4 -> 1/2
x128 = jax.random.uniform(key, (B, H//4, W//4, 128), DT)
w_up2 = jax.random.normal(jax.random.PRNGKey(2), (4, 4, 128, 32), DT) * 0.1
bench("unet up2 deconv 128->32 @1/4->1/2", loopify(lambda x: deconv(x, w_up2), x128), x128)

# final conv 16->3 @full s1
x16 = jax.random.uniform(key, (B, H, W, 16), DT)
w_f = jax.random.normal(jax.random.PRNGKey(3), (3, 3, 16, 3), DT) * 0.1
def conv(x, w, s):
    return lax.conv_general_dilated(
        x, w, (s, s), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)
bench("unet final conv 16->3 s1 @full", loopify(lambda x: conv(x, w_f, 1), x16), x16)

# ifblock lastconv deconv 90->5 @1/4 -> 1/2
x90 = jax.random.uniform(key, (B, H//4, W//4, 90), DT)
w_lc = jax.random.normal(jax.random.PRNGKey(4), (4, 4, 90, 5), DT) * 0.1
bench("lastconv deconv 90->5 @1/4->1/2", loopify(lambda x: deconv(x, w_lc), x90), x90)

# unet down0 conv2 32ch @1/2 s1
x32 = jax.random.uniform(key, (B, H//2, W//2, 32), DT)
w_d2 = jax.random.normal(jax.random.PRNGKey(5), (3, 3, 32, 32), DT) * 0.1
bench("unet down0.conv2 32->32 s1 @1/2", loopify(lambda x: conv(x, w_d2, 1), x32), x32)
