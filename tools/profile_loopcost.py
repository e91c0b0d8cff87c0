import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/rife_tpu_jit_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from jax import lax
H, W = 736, 1280
small = jax.random.uniform(jax.random.PRNGKey(1), (H, W), jnp.float32)

def bench(name, fn, *args, reps=4):
    float(jnp.sum(fn(*args)))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jnp.sum(fn(*args)))
        best = min(best, time.perf_counter()-t0)
    print(f"{name}: {best*1000:.2f} ms total", flush=True)

for K in (1, 10, 100):
    @jax.jit
    def loop(s, K=K):
        return lax.fori_loop(0, K, lambda i, s: s * 1.0001, s)
    bench(f"fori_loop K={K} elementwise", loop, small)

@jax.jit
def unrolled(s):
    for _ in range(10):
        s = s * 1.0001
    return s
bench("unrolled x10 (fused)", unrolled, small)
