"""Bisect model cost: no-op warp vs pallas warp vs xla; isolate stages."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/rife_tpu_jit_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
import sys as _sys
import rife_tpu.ops.warp
warp_mod = _sys.modules['rife_tpu.ops.warp']
import rife_tpu.models.ifnet as ifnet_mod
import rife_tpu.models.refine as refine_mod
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
    print(f"{name}: {dt*1000:.2f} ms", flush=True)

@jax.jit
def base(a): return jnp.mean(a)
bench("baseline", base, img0)

orig_warp = warp_mod.warp
def noop_warp(img, flow):
    return img + flow[..., :1].astype(img.dtype) * 0  # keep flow dependency
for mod in (warp_mod, ifnet_mod, refine_mod):
    mod.warp = noop_warp

full_noop = jax.jit(lambda p, a, b: jnp.mean(ifnet_mod.ifnet_apply(p, a, b, cfg=d.config)["merged"][-1]))
bench("full model NOOP warp", full_noop, params, img0, img1)
nr_noop = jax.jit(lambda p, a, b: jnp.mean(ifnet_mod.ifnet_apply(p, a, b, cfg=d.config, refine=False)["merged"][-1]))
bench("no-refine NOOP warp", nr_noop, params, img0, img1)

# restore pallas
for mod in (warp_mod, ifnet_mod, refine_mod):
    mod.warp = orig_warp
warp_mod.set_warp_impl("pallas")

# single block0 only
from rife_tpu.models.ifnet import ifblock_apply
x = jnp.concatenate([img0, img1], -1)
b0 = jax.jit(lambda p, x: jnp.mean(sum(jnp.mean(t) for t in ifblock_apply(p["block0"], x, None, 4.0))))
bench("block0 alone (scale4)", b0, params, x)
b2in = jnp.concatenate([img0, img1, img0, img1, img0[..., :1]], -1)
fl = jnp.zeros((B, H, W, 4), jnp.bfloat16)
b2 = jax.jit(lambda p, x, f: jnp.mean(sum(jnp.mean(t) for t in ifblock_apply(p["block2"], x, f, 1.0))))
bench("block2 alone (scale1)", b2, params, b2in, fl)
# contextnet alone (pallas warp)
cn = jax.jit(lambda p, a, f: jnp.mean(sum(jnp.mean(t) for t in refine_mod.contextnet_apply(p["contextnet"], a, f[..., :2]))))
bench("contextnet (pallas warp)", cn, params, img0, fl)
# unet alone
c0 = [jnp.zeros((B, H//2**i, W//2**i, 16*2**i), jnp.bfloat16) for i in range(4)]
un = jax.jit(lambda p, a, b: jnp.mean(refine_mod.unet_apply(p["unet"], a, b, a, b, a[..., :1], jnp.zeros((B,H,W,4), jnp.bfloat16), c0, c0)))
bench("unet alone", un, params, img0, img1)
