import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/rife_tpu_jit_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from jax import lax
from rife_tpu.ops import resize_bilinear
from rife_tpu.nn import conv_prelu, conv_transpose2d
from rife_tpu.models.registry import MODEL_REGISTRY

B, H, W = 4, 736, 1280
K = 10
d = MODEL_REGISTRY["rife"]
params = d.init(jax.random.PRNGKey(0), d.config)

def bench(name, fn, *args, reps=3):
    float(jnp.sum(fn(*args)))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jnp.sum(fn(*args)))
        best = min(best, time.perf_counter()-t0)
    print(f"{name}: {(best*1000-31)/K:.2f} ms/op net", flush=True)

x17 = jax.random.uniform(jax.random.PRNGKey(0), (B, H, W, 17), jnp.bfloat16)
x90 = jax.random.uniform(jax.random.PRNGKey(1), (B, H//4, W//4, 90), jnp.bfloat16)
x5 = jax.random.uniform(jax.random.PRNGKey(2), (B, H//2, W//2, 5), jnp.bfloat16)

@jax.jit
def conv0_loop(x):
    def body(i, x):
        a = conv_prelu(x, params["block2"]["conv0"][0], stride=2)
        a = conv_prelu(a, params["block2"]["conv0"][1], stride=2)
        return x + jnp.mean(a).astype(x.dtype)
    return lax.fori_loop(0, K, body, x)
bench("block2 conv0 (17ch fullres s2,s2)", conv0_loop, x17)

@jax.jit
def convblock_loop(x):
    def body(i, x):
        a = x
        for cp in params["block2"]["convblock"]:
            a = conv_prelu(a, cp)
        return x + jnp.mean(a).astype(x.dtype)
    return lax.fori_loop(0, K, body, x90)
bench("block2 convblock 8x c90 @1/4", convblock_loop, x90)

@jax.jit
def deconv_loop(x):
    def body(i, x):
        a = conv_transpose2d(x, params["block2"]["lastconv"])
        return x + jnp.mean(a).astype(x.dtype)
    return lax.fori_loop(0, K, body, x90)
bench("block2 lastconv deconv c90->5", deconv_loop, x90)

@jax.jit
def up2_loop(x):
    def body(i, x):
        a = resize_bilinear(x, (H, W))
        return x + jnp.mean(a).astype(x.dtype)
    return lax.fori_loop(0, K, body, x5)
bench("resize x2 up 5ch 368->736", up2_loop, x5)

img = jax.random.uniform(jax.random.PRNGKey(3), (B, H, W, 3), jnp.bfloat16)
@jax.jit
def down4_loop(x):
    def body(i, x):
        a = resize_bilinear(x, (H//4, W//4))
        return x + jnp.mean(a).astype(x.dtype)
    return lax.fori_loop(0, K, body, img)
bench("resize 1/4 down 3ch", down4_loop, img)

@jax.jit
def down2_loop(x):
    def body(i, x):
        a = resize_bilinear(x, (H//2, W//2))
        return x + jnp.mean(a).astype(x.dtype)
    return lax.fori_loop(0, K, body, x17)
bench("resize 1/2 down 17ch (2x2 mean path)", down2_loop, x17)

from rife_tpu.models.refine import unet_apply, contextnet_apply
import rife_tpu.models.refine as refine_mod
import sys as _s
warp_mod = _s.modules['rife_tpu.ops.warp']
orig = refine_mod.warp
refine_mod.warp = lambda img, flow: img + flow[..., :1].astype(img.dtype)*0
c0 = [jax.random.uniform(jax.random.PRNGKey(7+i), (B, H//2**(i+1), W//2**(i+1), 16*2**i), jnp.bfloat16) for i in range(4)]
mask = img[..., :1]; flow4 = jnp.zeros((B,H,W,4), jnp.bfloat16)
@jax.jit
def unet_loop(a, b):
    def body(i, a):
        r = unet_apply(params["unet"], a, b, a, b, mask, flow4, c0, c0)
        return a + jnp.mean(r).astype(a.dtype)
    return lax.fori_loop(0, K, body, a)
bench("unet convs (noop warp)", unet_loop, img, img)

@jax.jit
def ctx_loop(a):
    def body(i, a):
        fs = contextnet_apply(params["contextnet"], a, flow4[..., :2])
        return a + sum(jnp.mean(f) for f in fs).astype(a.dtype)
    return lax.fori_loop(0, K, body, a)
bench("contextnet convs (noop warp)", ctx_loop, img)
refine_mod.warp = orig
