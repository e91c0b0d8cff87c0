"""IFNet block-stack audit: convblocks, stems, lastconvs, resizes (b4)."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/rife_tpu_jit_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from jax import lax
from rife_tpu.models.registry import MODEL_REGISTRY
from rife_tpu.ops import resize_bilinear
from rife_tpu.nn import conv_prelu, conv_transpose2d

K = 30
B, H, W = 4, 736, 1280
d = MODEL_REGISTRY["rife"]
params = d.init(jax.random.PRNGKey(0), d.config)

def bench(name, fn, *args):
    @jax.jit
    def loop(*a):
        def body(i, x):
            return x + jnp.mean(fn(x, *a[1:])).astype(x.dtype)
        return jnp.mean(lax.fori_loop(0, K, body, a[0]))
    t0 = time.perf_counter(); float(loop(*args))
    print(f"  [{name} compile {time.perf_counter()-t0:.0f}s]", flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); float(loop(*args)); best = min(best, time.perf_counter()-t0)
    print(f"{name}: {best*1000/K:.2f} ms", flush=True)

key = jax.random.PRNGKey(0)

# convblock of each block at its working res
for (i, c, hh, ww) in [(0, 240, 46, 80), (1, 150, 92, 160), (2, 90, 184, 320)]:
    x = jax.random.uniform(key, (B, hh, ww, c), jnp.bfloat16)
    ps = params[f"block{i}"]["convblock"]
    def cb(x, ps=ps):
        a = x
        for cp in ps:
            a = conv_prelu(a, cp)
        return a + x
    bench(f"convblock{i} c{c}@{hh}x{ww}", cb, x)

# lastconv deconvs
for (i, c, hh, ww) in [(0, 240, 46, 80), (1, 150, 92, 160), (2, 90, 184, 320)]:
    x = jax.random.uniform(key, (B, hh, ww, c), jnp.bfloat16)
    p = params[f"block{i}"]["lastconv"]
    bench(f"lastconv{i}", lambda x, p=p: conv_transpose2d(x, p), x)

# the resize family used per forward
img17 = jax.random.uniform(key, (B, H, W, 17), jnp.bfloat16)
bench("resize 17ch 1/2", lambda x: resize_bilinear(x, (H//2, W//2)), img17)
bench("resize 17ch 1/4", lambda x: resize_bilinear(x, (H//4, W//4)), img17)
img6 = jax.random.uniform(key, (B, H, W, 6), jnp.bfloat16)
bench("resize 6ch 1/4", lambda x: resize_bilinear(x, (H//4, W//4)), img6)
x5 = jax.random.uniform(key, (B, H//2, W//2, 5), jnp.bfloat16)
bench("resize 5ch x2 up", lambda x: resize_bilinear(x, (H, W)), x5)
x5b = jax.random.uniform(key, (B, H//4, W//4, 5), jnp.bfloat16)
bench("resize 5ch x8 up(blk0 out)", lambda x: resize_bilinear(x, (H, W)), x5b)
print("done", flush=True)
