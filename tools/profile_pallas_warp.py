"""Compare XLA vs Pallas warp on TPU (foreground only; scalar-fetch timing)."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/rife_tpu_jit_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from rife_tpu.ops import warp_xla
from rife_tpu.ops.pallas.warp import warp_pallas

B, H, W, C = 4, 736, 1280, 3
img = jax.random.uniform(jax.random.PRNGKey(0), (B, H, W, C), jnp.bfloat16)
# smooth flow: coarse noise upsampled (realistic IFNet-like smoothness)
coarse = jax.random.normal(jax.random.PRNGKey(2), (B, H//32, W//32, 2), jnp.float32) * 10
from rife_tpu.ops import resize_bilinear
flow = resize_bilinear(coarse, (H, W)).astype(jnp.bfloat16)

def bench(name, fn, *args, iters=10):
    float(jnp.sum(fn(*args))); float(jnp.sum(fn(*args)))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(jnp.sum(fn(*args)))
    print(f"{name}: {(time.perf_counter()-t0)/iters*1000:.2f} ms/iter", flush=True)

@jax.jit
def base(a): return a * 2.0
bench("baseline elementwise+fetch", base, img)
xla_j = jax.jit(warp_xla)
bench("warp_xla 720p b4c3", xla_j, img, flow)
pl_j = jax.jit(lambda a, f: warp_pallas(a, f))
bench("warp_pallas 720p b4c3", pl_j, img, flow)
# correctness on-device
d = float(jnp.max(jnp.abs(xla_j(img, flow).astype(jnp.float32) - pl_j(img, flow).astype(jnp.float32))))
print("maxdiff xla vs pallas:", d)
