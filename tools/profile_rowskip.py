"""Row-predicated warp kernel: skip vs noskip on TPU."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/rife_tpu_jit_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from jax import lax
from rife_tpu.ops import resize_bilinear
from rife_tpu.ops.pallas.warp import warp_pallas

K = 20

def bench(name, img, flow, skip):
    @jax.jit
    def f(a, fl):
        def body(i, x):
            return warp_pallas(x, fl, skip=skip) * 0.999
        return jnp.mean(lax.fori_loop(0, K, body, a))
    t0 = time.perf_counter(); float(f(img, flow))
    print(f"  [{name} compile {time.perf_counter()-t0:.0f}s]", flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); float(f(img, flow)); best = min(best, time.perf_counter()-t0)
    print(f"{name}: {best*1000/K:.2f} ms/warp-call", flush=True)

def mk(n, h, w, c, cell, mag, seed):
    img = jax.random.uniform(jax.random.PRNGKey(seed), (n, h, w, c), jnp.bfloat16)
    coarse = jax.random.normal(jax.random.PRNGKey(seed+1), (n, h//cell, w//cell, 2), jnp.float32) * mag
    return img, resize_bilinear(coarse, (h, w))

# image warp: batch 8 (warp2 pair), 3 ch, 720p
img, flow = mk(8, 736, 1280, 3, 32, 6.0, 0)
bench("img b8c3 skip", img, flow, True)
bench("img b8c3 noskip", img, flow, False)

# feature warp level1: batch 8, c16 @ 368x640
img, flow = mk(8, 368, 640, 16, 16, 3.0, 2)
bench("feat b8c16 skip", img, flow, True)
bench("feat b8c16 noskip", img, flow, False)

# feature warp level2: batch 8, c32 @ 184x320
img, flow = mk(8, 184, 320, 32, 8, 1.5, 4)
bench("feat b8c32 skip", img, flow, True)
print("done", flush=True)
