"""Contextnet split: convs-only vs warps-only; tiling crossover for small convs."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/rife_tpu_jit_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from jax import lax
from rife_tpu.models.registry import MODEL_REGISTRY
import rife_tpu.models.refine as refine_mod
from rife_tpu.nn.layers import conv2d, use_conv_tiling
from rife_tpu.nn import conv_prelu_params
from rife_tpu.ops import use_warp_impl

K = 30
B, H, W = 4, 736, 1280
d = MODEL_REGISTRY["rife"]
params = d.init(jax.random.PRNGKey(0), d.config)
key = jax.random.PRNGKey(0)
img0 = jax.random.uniform(key, (B, H, W, 3), jnp.bfloat16)
img1 = jax.random.uniform(jax.random.PRNGKey(1), (B, H, W, 3), jnp.bfloat16)
from rife_tpu.ops import resize_bilinear
coarse = jax.random.normal(jax.random.PRNGKey(2), (B, H//32, W//32, 4), jnp.float32) * 3
flow4 = resize_bilinear(coarse, (H, W)).astype(jnp.bfloat16)

def bench(name, fn, *args):
    @jax.jit
    def loop(*a):
        def body(i, x):
            return x + fn(x, *a[1:]).astype(x.dtype)
        return jnp.mean(lax.fori_loop(0, K, body, a[0]))
    t0 = time.perf_counter(); float(loop(*args))
    print(f"  [{name} compile {time.perf_counter()-t0:.0f}s]", flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); float(loop(*args)); best = min(best, time.perf_counter()-t0)
    print(f"{name}: {best*1000/K:.2f} ms", flush=True)

# ctx convs only (noop warp)
orig = refine_mod.warp_planes
refine_mod.warp_planes = lambda im, fl: im + fl[:, :1].astype(im.dtype) * 0
def ctx_convs(x, b, f):
    cs0, cs1 = refine_mod.contextnet_apply_pair(params["contextnet"], x, b, f[..., :2], f[..., 2:4])
    return sum(jnp.mean(t) for t in cs0 + cs1)
bench("ctx convs only (noop warp)", ctx_convs, img0, img1, flow4)
refine_mod.warp_planes = orig

# ctx full with pallas warp (smooth flow)
with use_warp_impl("pallas"):
    def ctx_full(x, b, f):
        cs0, cs1 = refine_mod.contextnet_apply_pair(params["contextnet"], x, b, f[..., :2], f[..., 2:4])
        return sum(jnp.mean(t) for t in cs0 + cs1)
    bench("ctx full (pallas, smooth flow)", ctx_full, img0, img1, flow4)

# small-conv tiling crossover: 16->32 s2 @184x320 b8 and 32->32 s1
for (hh, ww, ci, co, st) in [(184, 320, 16, 32, 2), (92, 160, 32, 32, 1), (368, 640, 16, 16, 1)]:
    x = jax.random.uniform(key, (8, hh, ww, ci), jnp.bfloat16)
    p = conv_prelu_params(jax.random.PRNGKey(3), 3, 3, ci, co)["conv"]
    for t in (False, True):
        with use_conv_tiling(t):
            bench(f"conv {ci}->{co} s{st} @{hh}x{ww} tiled={t}",
                  lambda a, p=p, st=st: jnp.mean(conv2d(a, p, stride=st)), x)
print("done", flush=True)
