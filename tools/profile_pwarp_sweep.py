"""Sweep pallas warp window sizes to locate the cost driver."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/rife_tpu_jit_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from rife_tpu.ops import resize_bilinear
from rife_tpu.ops.pallas.warp import warp_pallas

B, H, W, C = 4, 736, 1280, 3
img = jax.random.uniform(jax.random.PRNGKey(0), (B, H, W, C), jnp.bfloat16)
coarse = jax.random.normal(jax.random.PRNGKey(2), (B, H//32, W//32, 2), jnp.float32) * 3
flow = resize_bilinear(coarse, (H, W)).astype(jnp.bfloat16)

def bench(name, fn, *args, iters=20):
    float(jnp.sum(fn(*args))); float(jnp.sum(fn(*args)))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(jnp.sum(fn(*args)))
    print(f"{name}: {(time.perf_counter()-t0)/iters*1000:.2f} ms/iter", flush=True)

@jax.jit
def base(a): return jnp.sum(a)
bench("baseline", base, img)
for wh, ww in [(16, 128), (16, 256), (32, 256), (64, 512)]:
    f = jax.jit(lambda a, fl, wh=wh, ww=ww: warp_pallas(a, fl, win_h=wh, win_w=ww))
    bench(f"pallas win {wh}x{ww}", f, img, flow)
# single plane cost
img1 = img[:1, ..., :1]
flow1 = flow[:1]
f1 = jax.jit(lambda a, fl: warp_pallas(a, fl))
bench("pallas b1c1 win64x512", f1, img1, flow1)
