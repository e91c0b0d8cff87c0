"""Stride-2 small-C conv rewrites: find a fast lowering."""
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

def conv(x, w, stride, dil=1, pad=1):
    return lax.conv_general_dilated(
        x, w, (stride, stride), ((pad, pad), (pad, pad)),
        rhs_dilation=(dil, dil),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)

def loopify(f, x):
    @jax.jit
    def g(x):
        def body(i, x):
            return x + jnp.mean(f(x)).astype(x.dtype)
        return lax.fori_loop(0, K, body, x)
    return g

x17 = jax.random.uniform(key, (B, H, W, 17), DT)
w1 = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 17, 45), DT) * 0.1
w2 = jax.random.normal(jax.random.PRNGKey(2), (3, 3, 45, 90), DT) * 0.1

# reference: fused stem as-is
def stem(x):
    y = conv(x, w1, 2)
    y = jnp.maximum(y, 0.1 * y)
    return conv(y, w2, 2)
bench("stem s2+s2 (current)", loopify(stem, x17), x17)

# rewrite: s1 conv at full res, then second conv as stride-4 dilated-2
def stem2(x):
    y = conv(x, w1, 1)
    y = jnp.maximum(y, 0.1 * y)
    return conv(y, w2, 4, dil=2, pad=2)
bench("stem s1full + s4d2", loopify(stem2, x17), x17)

# the pieces
bench("conv1 s1 @full 17->45", loopify(lambda x: conv(x, w1, 1), x17), x17)
x45f = jax.random.uniform(key, (B, H, W, 45), DT)
bench("conv2 s4d2 @full 45->90", loopify(lambda x: conv(x45f, w2, 4, dil=2, pad=2), x45f), x45f)

# stride-2 via lhs-side trick: conv s2 but batch folded (is it res or C?)
x17h = jax.random.uniform(key, (B, H//2, W//2, 17), DT)
bench("conv1 s2 @1/2 17->45", loopify(lambda x: conv(x17h, w1, 2), x17h), x17h)

# is it only the H-stride or W-stride?
def convhw(x, w, sh, sw):
    return lax.conv_general_dilated(
        x, w, (sh, sw), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)
bench("conv1 sH2 sW1 @full", loopify(lambda x: convhw(x, w1, 2, 1), x17), x17)
bench("conv1 sH1 sW2 @full", loopify(lambda x: convhw(x, w1, 1, 2), x17), x17)
