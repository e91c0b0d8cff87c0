"""Exp10: phase-lastconv + ty_min prep adoption measure.

1. isolated lastconv: conv_transpose2d+to_planes vs phase-conv planes
   (per block shape)
2. stem conv0a from planes: from_planes+NHWC-conv vs NCHW dimension
   numbers
3. ctx pair convs-only (fresh jit, fixes the stale-trace probe in
   r3_stages2.py)
4. full exact model + fast model (the headline after adoption)
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from jax import lax
from rife_tpu.models.registry import MODEL_REGISTRY
from rife_tpu.ops import use_warp_impl, to_planes, from_planes
from rife_tpu.nn import conv_transpose2d, conv_transpose2d_phase_planes, conv_prelu
from rife_tpu.nn.layers import _precision_for
import rife_tpu.models.refine as refine_mod
from dataclasses import replace

print("backend:", jax.default_backend(), flush=True)
B, H, W, K = 4, 736, 1280, 20
d = MODEL_REGISTRY["rife"]
params = d.init(jax.random.PRNGKey(0), d.config)

def bench(name, fn, *args, reps=3):
    t0 = time.perf_counter(); float(fn(*args))
    c = time.perf_counter() - t0
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1000/K:.2f} ms/iter  (compile {c:.0f}s)", flush=True)
    return best / K

# 1. isolated lastconv variants (y+x input at 1/4 working res)
shapes = [("block0", 240, 46, 80), ("block1", 150, 92, 160),
          ("block2", 90, 184, 320)]
for name, c, h, w in shapes:
    y = jax.random.uniform(jax.random.PRNGKey(3), (B, h, w, c), jnp.bfloat16)
    p = params[name]["lastconv"]

    @jax.jit
    def old(y):
        def body(i, y):
            t = to_planes(conv_transpose2d(y, p))
            return y + jnp.mean(t).astype(y.dtype)
        return jnp.mean(lax.fori_loop(0, K, body, y))

    @jax.jit
    def new(y):
        def body(i, y):
            t = conv_transpose2d_phase_planes(y, p)
            return y + jnp.mean(t).astype(y.dtype)
        return jnp.mean(lax.fori_loop(0, K, body, y))

    bench(f"lastconv {name} deconv+to_planes", old, y)
    bench(f"lastconv {name} phase planes", new, y)

# 2. stem conv0a from planes: NHWC relayout vs NCHW dimension numbers
for name, cin, h, w in [("block2 stem", 17, 736, 1280),
                        ("block1 stem", 17, 368, 640)]:
    pstem = params["block2" if "2" in name else "block1"]["conv0"][0]
    xpl = jax.random.uniform(jax.random.PRNGKey(4), (B, cin, h, w),
                             jnp.bfloat16)

    @jax.jit
    def nhwc(xpl):
        def body(i, xpl):
            out = conv_prelu(from_planes(xpl), pstem, stride=2)
            return xpl + jnp.mean(out).astype(xpl.dtype)
        return jnp.mean(lax.fori_loop(0, K, body, xpl))

    @jax.jit
    def nchw(xpl):
        def body(i, xpl):
            w_ = pstem["conv"]["w"].astype(xpl.dtype)
            out = lax.conv_general_dilated(
                xpl, w_, window_strides=(2, 2), padding=((1, 1), (1, 1)),
                dimension_numbers=("NCHW", "HWIO", "NHWC"),
                precision=_precision_for(xpl.dtype),
                preferred_element_type=xpl.dtype)
            out = out + pstem["conv"]["b"].astype(xpl.dtype)
            a = pstem["alpha"].astype(xpl.dtype)
            out = jnp.where(out >= 0, out, out * a)
            return xpl + jnp.mean(out).astype(xpl.dtype)
        return jnp.mean(lax.fori_loop(0, K, body, xpl))

    bench(f"{name} from_planes+NHWC(tiled)", nhwc, xpl)
    bench(f"{name} NCHW dimnums", nchw, xpl)

# 2b. unet finale conv 16->3 @736x1280: NHWC out vs NCHW (planes) out
from rife_tpu.nn.layers import conv2d
pfin = params["unet"]["conv"] if "conv" in params["unet"] else None
if pfin is None:
    import jax.random as jr
    pfin = {"w": jr.normal(jr.PRNGKey(9), (3, 3, 16, 3), jnp.float32) * 0.05,
            "b": jnp.zeros((3,), jnp.float32)}
xf = jax.random.uniform(jax.random.PRNGKey(5), (B, 736, 1280, 16),
                        jnp.bfloat16)

@jax.jit
def fin_nhwc(x):
    def body(i, x):
        out = conv2d(x, pfin, stride=1)
        return x + jnp.mean(out).astype(x.dtype)
    return jnp.mean(lax.fori_loop(0, K, body, x))

@jax.jit
def fin_nchw(x):
    def body(i, x):
        w_ = pfin["w"].astype(x.dtype)
        out = lax.conv_general_dilated(
            x, w_, window_strides=(1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NCHW"),
            precision=_precision_for(x.dtype),
            preferred_element_type=x.dtype)
        out = out + pfin["b"].astype(x.dtype).reshape(1, -1, 1, 1)
        return x + jnp.mean(out).astype(x.dtype)
    return jnp.mean(lax.fori_loop(0, K, body, x))

bench("unet finale NHWC out (tiled)", fin_nhwc, xf)
bench("unet finale NCHW out", fin_nchw, xf)

# 3. ctx pair convs only, fresh jit (fixes stale-trace probe)
img0 = jax.random.uniform(jax.random.PRNGKey(0), (B, H, W, 3), jnp.bfloat16)
img1 = jax.random.uniform(jax.random.PRNGKey(1), (B, H, W, 3), jnp.bfloat16)
flow_pl = to_planes(
    jax.random.normal(jax.random.PRNGKey(2), (B, H, W, 4), jnp.bfloat16) * 2
).astype(jnp.float32)
orig = refine_mod.warp_planes
refine_mod.warp_planes = lambda im, fl: im + fl[:, :1].astype(im.dtype) * 0

@jax.jit
def ctx_convs(a, b, f):
    def body(i, x):
        c0, c1 = refine_mod.contextnet_apply_pair(
            params["contextnet"], x, b, f[:, :2], f[:, 2:4])
        return x + sum(jnp.mean(t) for t in c0 + c1).astype(x.dtype)
    return jnp.mean(lax.fori_loop(0, K, body, a))
with use_warp_impl("pallas"):
    bench("ctx pair convs only (fresh)", ctx_convs, img0, img1, flow_pl)
refine_mod.warp_planes = orig

# 4. full model exact + fast
with use_warp_impl("pallas"):
    @jax.jit
    def full(p, a, b):
        def body(i, x):
            return d.apply(p, x, b, scale_list=d.scale_list,
                           cfg=d.config)["merged"][-1]
        return jnp.mean(lax.fori_loop(0, K, body, a))
    t = bench("FULL exact (phase lastconv)", full, params, img0, img1)
    print(f"  -> exact {B/t:.1f} fps/chip", flush=True)

    cfg_fast = replace(d.config, fast_level0=True)

    @jax.jit
    def fullfast(p, a, b):
        def body(i, x):
            return d.apply(p, x, b, scale_list=d.scale_list,
                           cfg=cfg_fast)["merged"][-1]
        return jnp.mean(lax.fori_loop(0, K, body, a))
    t = bench("FULL fast (phase lastconv)", fullfast, params, img0, img1)
    print(f"  -> fast {B/t:.1f} fps/chip", flush=True)

print("done", flush=True)
