"""Round-2 stage budget on TPU: full model, no-refine, warps, unet.

K-chained in one jit per variant (CLAUDE.md methodology).  Run with
python -u; compiles are minutes each through the remote service.
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/rife_tpu_jit_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from jax import lax
from rife_tpu.models.registry import MODEL_REGISTRY
from rife_tpu.ops import use_warp_impl
import rife_tpu.models.ifnet as ifnet_mod
import rife_tpu.models.refine as refine_mod

B, H, W, K = 4, 736, 1280, 20
img0 = jax.random.uniform(jax.random.PRNGKey(0), (B, H, W, 3), jnp.bfloat16)
img1 = jax.random.uniform(jax.random.PRNGKey(1), (B, H, W, 3), jnp.bfloat16)
d = MODEL_REGISTRY["rife"]
params = d.init(jax.random.PRNGKey(0), d.config)

def bench(name, fn, *args, reps=3):
    t0 = time.perf_counter(); float(fn(*args))
    print(f"  [{name} first call {time.perf_counter()-t0:.1f}s]", flush=True)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter()-t0)
    print(f"{name}: {best*1000/K:.2f} ms/iter", flush=True)

def kloop(body):
    @jax.jit
    def f(p, a, b):
        return jnp.mean(lax.fori_loop(0, K, lambda i, x: body(p, x, b), a))
    return f

with use_warp_impl("pallas"):
    # identical structure to bench.py's chained loop (cache hit)
    bench("full model", kloop(
        lambda p, a, b: d.apply(p, a, b, scale_list=d.scale_list, cfg=d.config)["merged"][-1]),
        params, img0, img1)

    bench("no-refine", kloop(
        lambda p, a, b: ifnet_mod.ifnet_apply(
            p, a, b, scale_list=d.scale_list, cfg=d.config, refine=False)["merged"][-1]),
        params, img0, img1)

    # 3 levels x warp2 on full-res images (the image-warp budget)
    from rife_tpu.ops import warp2
    flow = jax.random.normal(jax.random.PRNGKey(2), (B, H, W, 4), jnp.bfloat16) * 2

    @jax.jit
    def warps_only(a, b, f):
        def body(i, x):
            w0, w1 = warp2(x, b, f[..., :2], f[..., 2:4])
            w0b, w1b = warp2(x, b, f[..., :2] * 0.5, f[..., 2:4] * 0.5)
            w0c, w1c = warp2(x, b, f[..., :2] * 0.25, f[..., 2:4] * 0.25)
            return (w0 + w1 + w0b + w1b + w0c + w1c) / 6
        return jnp.mean(lax.fori_loop(0, K, body, a))
    bench("6 image warps", warps_only, img0, img1, flow)

    # unet alone at full res
    c0 = [jax.random.uniform(jax.random.PRNGKey(7 + i),
                             (B, H // 2**(i+1), W // 2**(i+1), 16 * 2**i), jnp.bfloat16)
          for i in range(4)]
    mask = img0[..., :1]

    @jax.jit
    def unet_only(a, b, f):
        def body(i, x):
            r = refine_mod.unet_apply(params["unet"], x, b, x, b, mask, f, c0, c0)
            return x + jnp.mean(r).astype(x.dtype)
        return jnp.mean(lax.fori_loop(0, K, body, a))
    bench("unet (pre-warped ctx)", unet_only, img0, img1, flow)

    # contextnet pair (8 feature warps + convs)
    @jax.jit
    def ctx_only(a, b, f):
        def body(i, x):
            cs0, cs1 = refine_mod.contextnet_apply_pair(
                params["contextnet"], x, b, f[..., :2], f[..., 2:4])
            return x + sum(jnp.mean(t) for t in cs0 + cs1).astype(x.dtype)
        return jnp.mean(lax.fori_loop(0, K, body, a))
    bench("contextnet pair", ctx_only, img0, img1, flow)
print("done", flush=True)
