"""tile_h 32 vs 64 + bf16 output on TPU; lastconv phase-deconv check."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/rife_tpu_jit_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from jax import lax
from rife_tpu.ops import resize_bilinear
from rife_tpu.ops.pallas.warp import warp_pallas
from rife_tpu.ops.pallas.warp_v4 import warp_pallas_v4

K = 20

def bench(name, fn, *args):
    @jax.jit
    def f(a, *rest):
        def body(i, x):
            return fn(x, *rest).astype(x.dtype) * 0.999 if fn(x, *rest).shape == x.shape else x + jnp.mean(fn(x, *rest)).astype(x.dtype)
        return jnp.mean(lax.fori_loop(0, K, body, a))
    t0 = time.perf_counter(); float(f(*args))
    print(f"  [{name} compile {time.perf_counter()-t0:.0f}s]", flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); float(f(*args)); best = min(best, time.perf_counter()-t0)
    print(f"{name}: {best*1000/K:.2f} ms", flush=True)

def mk(n, h, w, c, cell, mag, seed):
    img = jax.random.uniform(jax.random.PRNGKey(seed), (n, h, w, c), jnp.bfloat16)
    coarse = jax.random.normal(jax.random.PRNGKey(seed+1), (n, h//cell, w//cell, 2), jnp.float32) * mag
    return img, resize_bilinear(coarse, (h, w))

img, flow = mk(8, 736, 1280, 3, 32, 6.0, 0)
bench("v3 img b8c3 th32 bf16out", lambda a, f: warp_pallas(a, f), img, flow)
bench("v3 img b8c3 th64 bf16out", lambda a, f: warp_pallas(a, f, tile_h=64), img, flow)

img, flow = mk(8, 368, 640, 16, 16, 3.0, 2)
bench("v4 feat b8c16 th32 bf16out", lambda a, f: warp_pallas_v4(a, f), img, flow)
bench("v4 feat b8c16 th64 bf16out", lambda a, f: warp_pallas_v4(a, f, tile_h=64), img, flow)

# lastconv phase vs dilated (k4 s2, co=5)
from rife_tpu.nn.layers import conv_transpose2d, _deconv422_phase
from rife_tpu.nn import deconv_prelu_params
for (hh, ww, ci, tag) in [(46, 80, 240, "lastconv0"), (92, 160, 150, "lastconv1"),
                          (184, 320, 90, "lastconv2")]:
    x = jax.random.uniform(jax.random.PRNGKey(7), (4, hh, ww, ci), jnp.bfloat16)
    p = deconv_prelu_params(jax.random.PRNGKey(8), 4, ci, 5)["conv"]
    bench(f"{tag} dilated", lambda a, pp=p: conv_transpose2d(a, pp), x)
    bench(f"{tag} phase", lambda a, pp=p: _deconv422_phase(a, pp), x)
print("done", flush=True)
