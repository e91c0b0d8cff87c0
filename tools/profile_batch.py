"""Batch-size sweep + v4.25 compile check on TPU."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/rife_tpu_jit_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from jax import lax
from rife_tpu.ops import use_warp_impl
from rife_tpu.models.registry import MODEL_REGISTRY

H, W, K = 736, 1280, 10

def bench(name, fn, *args, frames=1, reps=3):
    float(fn(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter()-t0)
    net = best - 0.031
    print(f"{name}: {net/K*1000:.1f} ms/iter = {frames*K/net:.1f} fps", flush=True)

d = MODEL_REGISTRY["rife"]
params = d.init(jax.random.PRNGKey(0), d.config)
with use_warp_impl("pallas"):
    for B in ():
        img0 = jax.random.uniform(jax.random.PRNGKey(0), (B, H, W, 3), jnp.bfloat16)
        img1 = jax.random.uniform(jax.random.PRNGKey(1), (B, H, W, 3), jnp.bfloat16)
        @jax.jit
        def loop(p, a, b):
            def body(i, a):
                return d.apply(p, a, b, scale_list=d.scale_list, cfg=d.config)["merged"][-1]
            return jnp.mean(lax.fori_loop(0, K, body, a))
        bench(f"rife batch{B}", loop, params, img0, img1, frames=B)

    v = MODEL_REGISTRY["v4.25"]
    vp = v.init(jax.random.PRNGKey(0), v.config)
    img0 = jax.random.uniform(jax.random.PRNGKey(0), (4, 768, W, 3), jnp.bfloat16)
    img1 = jax.random.uniform(jax.random.PRNGKey(1), (4, 768, W, 3), jnp.bfloat16)
    @jax.jit
    def vloop(p, a, b):
        def body(i, a):
            return v.apply(p, a, b, timestep=0.5, scale_list=v.scale_list, cfg=v.config)["merged"][-1]
        return jnp.mean(lax.fori_loop(0, K, body, a))
    bench("v4.25 batch4", vloop, vp, img0, img1, frames=4)
