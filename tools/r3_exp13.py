"""Exp13: in-graph marginal costs of the NON-warp stages.

Exp11 measured the warp side by noop-ablation inside the full exact
graph (warps = 20.9 ms of 59).  Same technique for the conv/glue side:
replace one stage with a cheap shape-preserving fake and measure the
full-graph delta.  Isolated probes overestimate (XLA overlaps stages),
so these are the numbers that rank the remaining work.

1. full exact               (baseline)
2. refine=False             (ctx convs + feature warps + unet)
3. noop unet                (keep ctx+feature warps)
4. noop ctx convs           (keep feature warps + unet on fake pyramids)
5. cheap scalar prep        (iota scalars, no reduce_windows)
6. noop plane_up            (lastconv upsample glue)
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from jax import lax
from rife_tpu.models.registry import MODEL_REGISTRY
from rife_tpu.ops import use_warp_impl, plane_down2
import rife_tpu.models.ifnet as ifnet_mod
import rife_tpu.models.refine as refine_mod
import rife_tpu.ops.resize as resize_mod
import rife_tpu.ops.pallas.warp_v5 as v5_mod
from rife_tpu.ops.pallas.warp import SUB_H, SUB_W, TILE_W

print("backend:", jax.default_backend(), flush=True)
B, H, W, K = 4, 736, 1280, 20
d = MODEL_REGISTRY["rife"]
params = d.init(jax.random.PRNGKey(0), d.config)
img0 = jax.random.uniform(jax.random.PRNGKey(0), (B, H, W, 3), jnp.bfloat16)
img1 = jax.random.uniform(jax.random.PRNGKey(1), (B, H, W, 3), jnp.bfloat16)


def bench(name, *args, reps=3, iters=K):
    @jax.jit
    def full(p, a, b):
        def body(i, x):
            return d.apply(p, x, b, scale_list=d.scale_list,
                           cfg=d.config)["merged"][-1]
        return jnp.mean(lax.fori_loop(0, K, body, a))
    t0 = time.perf_counter(); float(full(*args))
    c = time.perf_counter() - t0
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        float(full(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1000/iters:.2f} ms/iter  "
          f"({B*iters/best:.1f} fps)  (compile {c:.0f}s)", flush=True)


def fake_unet(p, x17, c0, c1, half_res=False):
    return jax.nn.sigmoid(x17[..., :3])


def fake_ctx_pair(p, img0, img1, f0_pl, f1_pl, half_res=False):
    """Skip the 8 Conv2 stages but keep the 8 feature warps (batched as
    4 pair calls) on right-shaped fake pyramids."""
    n = img0.shape[0]
    img = jnp.concatenate([img0, img1], 0)
    flow_pl = jnp.concatenate([f0_pl, f1_pl], 0)
    x_pl = ifnet_mod.to_planes(img)
    feats = []
    for c in (16, 32, 64, 128):
        x_pl = plane_down2(x_pl)
        flow_pl = plane_down2(flow_pl) * 0.5
        f_pl = jnp.tile(x_pl, (1, (c + 2) // 3, 1, 1))[:, :c]
        feats.append(ifnet_mod.from_planes(
            refine_mod.warp_planes(f_pl.astype(jnp.bfloat16), flow_pl)))
    return [f[:n] for f in feats], [f[n:] for f in feats]


def cheap_scalars(flow_pl, H, W, HP, WP, win_w, tile_h):
    """Zero-flow closed-form scalars: no reduce_windows, no int planes.
    Kernel work stays comparable (y2=1, in-window gathers)."""
    n = flow_pl.shape[0]
    nsh, nsw = HP // SUB_H, WP // SUB_W
    ys = jnp.minimum(
        lax.broadcasted_iota(jnp.int32, (n, nsh, nsw), 1) * SUB_H, HP - SUB_H)
    xs = lax.broadcasted_iota(jnp.int32, (n, nsh, nsw), 2) * SUB_W
    wx = jnp.clip((xs // SUB_W) * SUB_W, 0, max(WP - win_w, 0))
    sc = jnp.stack([
        ys.reshape(-1), wx.reshape(-1),
        jnp.ones((n * nsh * nsw,), jnp.int32),
        xs.reshape(-1), (xs + SUB_W - 1).reshape(-1),
    ]).astype(jnp.int32)
    nth, ntw = HP // tile_h, WP // TILE_W
    ty = jnp.minimum(
        lax.broadcasted_iota(jnp.int32, (n, nth, ntw), 1) * tile_h, HP - SUB_H)
    rowblk = jnp.clip(ty // v5_mod.WIN_ROWS, 0,
                      max(HP // v5_mod.WIN_ROWS - 3, 0))
    return sc, rowblk.reshape(-1).astype(jnp.int32)


with use_warp_impl("pallas"):
    bench("full exact", params, img0, img1)

    saved_u = refine_mod.unet_apply
    saved_ui = ifnet_mod.unet_apply
    refine_mod.unet_apply = fake_unet
    ifnet_mod.unet_apply = fake_unet
    bench("full, noop unet", params, img0, img1)
    refine_mod.unet_apply = saved_u
    ifnet_mod.unet_apply = saved_ui

    saved_c = refine_mod.contextnet_apply_pair
    saved_ci = ifnet_mod.contextnet_apply_pair
    refine_mod.contextnet_apply_pair = fake_ctx_pair
    ifnet_mod.contextnet_apply_pair = fake_ctx_pair
    bench("full, noop ctx convs", params, img0, img1)
    refine_mod.contextnet_apply_pair = saved_c
    ifnet_mod.contextnet_apply_pair = saved_ci

    saved_s = v5_mod._tile_scalars_v5_pl
    v5_mod._tile_scalars_v5_pl = cheap_scalars
    bench("full, cheap scalar prep", params, img0, img1)
    v5_mod._tile_scalars_v5_pl = saved_s

    saved_pu = resize_mod.plane_up
    import rife_tpu.models.ifnet as _if
    fake_pu = lambda p, f: jnp.tile(p, (1, 1, f, f)).reshape(
        p.shape[0], p.shape[1], p.shape[2] * f, p.shape[3] * f)
    # tile+reshape is NOT bilinear but shape-preserving and cheap-ish;
    # measure the true plane_up marginal.
    _if.plane_up = fake_pu
    bench("full, tile plane_up", params, img0, img1)
    _if.plane_up = saved_pu

print("done", flush=True)
