"""Round-3 stage budget on the plane-glue graph (post exp9 adoption).

Decomposes the exact bf16 720p b4 iteration (59 ms at the 67.7 fps
point) into: student (no-refine), refine delta, ctx pair (convs vs
warps), unet, image warps on planes, scalar-prep, resize glue.
K-chained in one jit per variant (CLAUDE.md methodology).
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from jax import lax
from rife_tpu.models.registry import MODEL_REGISTRY
from rife_tpu.ops import use_warp_impl, to_planes, warp2_planes
import rife_tpu.models.ifnet as ifnet_mod
import rife_tpu.models.refine as refine_mod

print("backend:", jax.default_backend(), flush=True)
B, H, W, K = 4, 736, 1280, 20
img0 = jax.random.uniform(jax.random.PRNGKey(0), (B, H, W, 3), jnp.bfloat16)
img1 = jax.random.uniform(jax.random.PRNGKey(1), (B, H, W, 3), jnp.bfloat16)
d = MODEL_REGISTRY["rife"]
params = d.init(jax.random.PRNGKey(0), d.config)

def bench(name, fn, *args, reps=3):
    t0 = time.perf_counter(); float(fn(*args))
    c = time.perf_counter() - t0
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter()-t0)
    print(f"{name}: {best*1000/K:.2f} ms/iter  (compile {c:.0f}s)", flush=True)

def kloop(body):
    @jax.jit
    def f(p, a, b):
        return jnp.mean(lax.fori_loop(0, K, lambda i, x: body(p, x, b), a))
    return f

with use_warp_impl("pallas"):
    bench("student only (no refine)", kloop(
        lambda p, a, b: ifnet_mod.ifnet_apply(
            p, a, b, scale_list=d.scale_list, cfg=d.config,
            refine=False)["merged"][-1]),
        params, img0, img1)

    # contextnet pair: full, and convs-only (noop plane warp)
    flow_pl = to_planes(
        jax.random.normal(jax.random.PRNGKey(2), (B, H, W, 4), jnp.bfloat16) * 2
    ).astype(jnp.float32)

    @jax.jit
    def ctx_full(a, b, f):
        def body(i, x):
            c0, c1 = refine_mod.contextnet_apply_pair(
                params["contextnet"], x, b, f[:, :2], f[:, 2:4])
            return x + sum(jnp.mean(t) for t in c0 + c1).astype(x.dtype)
        return jnp.mean(lax.fori_loop(0, K, body, a))
    bench("ctx pair (convs+8 warps)", ctx_full, img0, img1, flow_pl)

    orig = refine_mod.warp_planes
    refine_mod.warp_planes = lambda im, fl: im + fl[:, :1].astype(im.dtype) * 0
    bench("ctx pair convs only", ctx_full, img0, img1, flow_pl)
    refine_mod.warp_planes = orig

    # unet alone (x17 signature)
    c0 = [jax.random.uniform(jax.random.PRNGKey(7 + i),
                             (B, H // 2**(i+1), W // 2**(i+1), 16 * 2**i),
                             jnp.bfloat16)
          for i in range(4)]
    x17 = jax.random.uniform(jax.random.PRNGKey(11), (B, H, W, 17),
                             jnp.bfloat16)

    @jax.jit
    def unet_only(x, _unused):
        def body(i, x):
            r = refine_mod.unet_apply(params["unet"], x, c0, c0)
            return x + jnp.mean(r).astype(x.dtype)
        return jnp.mean(lax.fori_loop(0, K, body, x17))
    bench("unet only", unet_only, x17, None)

    # 6 image warps on planes (3 levels x warp2)
    i0p, i1p = to_planes(img0), to_planes(img1)

    @jax.jit
    def warps_only(a, b, f):
        def body(i, x):
            w0, w1 = warp2_planes(x, b, f[:, :2], f[:, 2:4])
            w0b, w1b = warp2_planes(x, b, f[:, :2] * 0.5, f[:, 2:4] * 0.5)
            w0c, w1c = warp2_planes(x, b, f[:, :2] * .25, f[:, 2:4] * .25)
            return (w0 + w1 + w0b + w1b + w0c + w1c) / 6
        return jnp.mean(lax.fori_loop(0, K, body, a))
    bench("6 image warps (planes)", warps_only, i0p, i1p, flow_pl)

    # scalar-prep alone: 7 preps per iter (the per-warp-call XLA cost)
    from rife_tpu.ops.pallas.warp_v5 import _tile_scalars_v5_pl

    @jax.jit
    def preps_only(f):
        def body(i, acc):
            s = 0.0
            for k in range(7):
                sc, rb = _tile_scalars_v5_pl(
                    f + jnp.float32(i + k), H, W, H, W, 256, 32)
                s = s + jnp.sum(sc[:, :4]) + jnp.sum(rb[:4])
            return acc + s.astype(jnp.float32)
        return lax.fori_loop(0, K, body, jnp.float32(0))
    f8 = jnp.concatenate([flow_pl[:, :2], flow_pl[:, :2]], 0)
    bench("7x scalar-prep (planes)", lambda p, a, b: preps_only(f8),
          params, None, None)

    # the three IFBlock conv cores at working res (half_res=False)
    xs = {
        "block0": jax.random.uniform(jax.random.PRNGKey(21),
                                     (B, H // 4, W // 4, 6), jnp.bfloat16),
        "block1": jax.random.uniform(jax.random.PRNGKey(22),
                                     (B, H // 2, W // 2, 17), jnp.bfloat16),
        "block2": jax.random.uniform(jax.random.PRNGKey(23),
                                     (B, H, W, 17), jnp.bfloat16),
    }
    for name in ("block0", "block1", "block2"):
        x0 = xs[name]
        p0 = params[name]

        @jax.jit
        def core_only(x, p=p0):
            def body(i, x):
                t = ifnet_mod.ifblock_conv_core(p, x)
                return x + jnp.mean(t).astype(x.dtype)
            return jnp.mean(lax.fori_loop(0, K, body, x))
        bench(f"{name} conv core", core_only, x0)

print("done", flush=True)
