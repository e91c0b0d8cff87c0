"""v3 vs v4 warp kernel on TPU: image and feature shapes."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/rife_tpu_jit_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from jax import lax
from rife_tpu.ops import resize_bilinear
from rife_tpu.ops.pallas.warp import warp_pallas
from rife_tpu.ops.pallas.warp_v4 import warp_pallas_v4

K = 20

def bench(name, fn, img, flow):
    @jax.jit
    def f(a, fl):
        def body(i, x):
            return fn(x, fl) * 0.999
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

img, flow = mk(8, 736, 1280, 3, 32, 6.0, 0)
bench("v3 img b8c3 (auto)", lambda a, f: warp_pallas(a, f), img, flow)
bench("v4 img b8c3 (auto)", lambda a, f: warp_pallas_v4(a, f), img, flow)
bench("v4 img b8c3 skip", lambda a, f: warp_pallas_v4(a, f, skip=True), img, flow)

# correctness on-device vs v3
d = float(jnp.max(jnp.abs(
    jax.jit(lambda a, f: warp_pallas(a, f))(img, flow).astype(jnp.float32)
    - jax.jit(lambda a, f: warp_pallas_v4(a, f))(img, flow).astype(jnp.float32))))
print("maxdiff v3 vs v4 (img):", d, flush=True)

img, flow = mk(8, 368, 640, 16, 16, 3.0, 2)
bench("v3 feat b8c16", lambda a, f: warp_pallas(a, f), img, flow)
bench("v4 feat b8c16", lambda a, f: warp_pallas_v4(a, f), img, flow)

img, flow = mk(8, 184, 320, 32, 8, 1.5, 4)
bench("v3 feat b8c32", lambda a, f: warp_pallas(a, f), img, flow)
bench("v4 feat b8c32", lambda a, f: warp_pallas_v4(a, f), img, flow)
print("done", flush=True)
