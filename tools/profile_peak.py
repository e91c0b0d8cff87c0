import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/rife_tpu_jit_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from jax import lax
K = 10

def bench(name, fn, flops, *args, reps=3):
    float(jnp.sum(fn(*args)))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jnp.sum(fn(*args)))
        best = min(best, time.perf_counter()-t0)
    net = (best - 0.031)/K
    print(f"{name}: {net*1000:.2f} ms/op -> {flops/net/1e12:.1f} TFLOP/s", flush=True)

a = jax.random.uniform(jax.random.PRNGKey(0), (4096, 4096), jnp.bfloat16)
b = jax.random.uniform(jax.random.PRNGKey(1), (4096, 4096), jnp.bfloat16)
@jax.jit
def mm(a, b):
    def body(i, a):
        return lax.dot(a, b, preferred_element_type=jnp.bfloat16)
    return lax.fori_loop(0, K, body, a)
bench("matmul 4096^3 bf16", mm, 2*4096**3, a, b)

x = jax.random.uniform(jax.random.PRNGKey(2), (4, 184, 320, 128), jnp.bfloat16)
w = jax.random.uniform(jax.random.PRNGKey(3), (3, 3, 128, 128), jnp.bfloat16) * 0.01
@jax.jit
def conv(x, w):
    def body(i, x):
        return lax.conv_general_dilated(x, w, (1,1), ((1,1),(1,1)),
            dimension_numbers=("NHWC","HWIO","NHWC"),
            preferred_element_type=jnp.bfloat16)
    return lax.fori_loop(0, K, body, x)
fl = 2*4*184*320*128*128*9
bench("conv3x3 c128 @184x320", conv, fl, x, w)

x2 = jax.random.uniform(jax.random.PRNGKey(2), (4, 368, 640, 90), jnp.bfloat16)
w2 = jax.random.uniform(jax.random.PRNGKey(3), (3, 3, 90, 90), jnp.bfloat16) * 0.01
@jax.jit
def conv2(x, w):
    def body(i, x):
        return lax.conv_general_dilated(x, w, (1,1), ((1,1),(1,1)),
            dimension_numbers=("NHWC","HWIO","NHWC"),
            preferred_element_type=jnp.bfloat16)
    return lax.fori_loop(0, K, body, x2)
fl2 = 2*4*368*640*90*90*9
bench("conv3x3 c90 @368x640", conv2, fl2, x2, w2)
