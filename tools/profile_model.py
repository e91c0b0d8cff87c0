"""End-to-end model timing with warp impl comparison."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/rife_tpu_jit_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from rife_tpu.ops import use_warp_impl
from rife_tpu.models.ifnet import ifnet_apply
from rife_tpu.models.registry import MODEL_REGISTRY

B, H, W = 4, 736, 1280
img0 = jax.random.uniform(jax.random.PRNGKey(0), (B, H, W, 3), jnp.bfloat16)
img1 = jax.random.uniform(jax.random.PRNGKey(1), (B, H, W, 3), jnp.bfloat16)
d = MODEL_REGISTRY["rife"]
params = d.init(jax.random.PRNGKey(0), d.config)

def bench(name, fn, *args, iters=10):
    float(fn(*args)); float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(fn(*args))
    dt = (time.perf_counter()-t0)/iters
    print(f"{name}: {dt*1000:.2f} ms/iter = {B/dt:.1f} fps", flush=True)

@jax.jit
def base(a): return jnp.mean(a)
bench("baseline", base, img0)

for impl in ("pallas", "xla"):
    with use_warp_impl(impl):
        full = jax.jit(lambda p, a, b: jnp.mean(ifnet_apply(p, a, b, cfg=d.config)["merged"][-1]))
        bench(f"ifnet full ({impl} warp)", full, params, img0, img1)
        nr = jax.jit(lambda p, a, b: jnp.mean(ifnet_apply(p, a, b, cfg=d.config, refine=False)["merged"][-1]))
        bench(f"ifnet no-refine ({impl} warp)", nr, params, img0, img1)
