"""Chained-in-jit timing: K dependent iterations per fetch, RTT amortized."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/rife_tpu_jit_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from jax import lax
from rife_tpu.ops import resize_bilinear, use_warp_impl
from rife_tpu.ops.pallas.warp import warp_pallas
from rife_tpu.ops.warp import warp_xla
from rife_tpu.models.ifnet import ifnet_apply
from rife_tpu.models.registry import MODEL_REGISTRY

B, H, W, C = 4, 736, 1280, 3
K = 10
img = jax.random.uniform(jax.random.PRNGKey(0), (B, H, W, C), jnp.bfloat16)
img2 = jax.random.uniform(jax.random.PRNGKey(1), (B, H, W, C), jnp.bfloat16)
coarse = jax.random.normal(jax.random.PRNGKey(2), (B, H//32, W//32, 2), jnp.float32) * 3
flow = resize_bilinear(coarse, (H, W)).astype(jnp.bfloat16)

def bench(name, fn, *args, reps=3):
    float(jnp.sum(fn(*args)))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jnp.sum(fn(*args)))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best/K*1000:.2f} ms/op (best of {reps}, {K} chained)", flush=True)

@jax.jit
def warp_p_loop(a, f):
    def body(i, a):
        return warp_pallas(a, f)
    return lax.fori_loop(0, K, body, a)
bench("warp_pallas 720p b4c3", warp_p_loop, img, flow)

@jax.jit
def warp_x_loop(a, f):
    def body(i, a):
        return warp_xla(a, f)
    return lax.fori_loop(0, K, body, a)
bench("warp_xla 720p b4c3", warp_x_loop, img, flow)

# feature-map warp: C=32 at 1/2 res
fimg = jax.random.uniform(jax.random.PRNGKey(3), (B, H//2, W//2, 32), jnp.bfloat16)
fflow = resize_bilinear(coarse, (H//2, W//2)).astype(jnp.bfloat16) * 0.5
@jax.jit
def warp_feat_loop(a, f):
    def body(i, a):
        return warp_pallas(a, f)
    return lax.fori_loop(0, K, body, a)
bench("warp_pallas feat b4c32 360p", warp_feat_loop, fimg, fflow)

d = MODEL_REGISTRY["rife"]
params = d.init(jax.random.PRNGKey(0), d.config)
with use_warp_impl("pallas"):
    @jax.jit
    def model_loop(p, a, b):
        def body(i, a):
            return ifnet_apply(p, a, b, cfg=d.config)["merged"][-1]
        return lax.fori_loop(0, K, body, a)
    bench("ifnet FULL (pallas warp)", model_loop, params, img, img2)
