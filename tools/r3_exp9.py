"""Round-3 experiment 9 (TPU): end-to-end fps with the plane-major glue
(warp v5 plane entries, plane flow/mask, dense scalar prep), exact and
fast modes, plus the dense-plane scalar-prep microbench."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from jax import lax

print("backend:", jax.default_backend(), flush=True)
B, H, W = 4, 736, 1280
ITERS = 20

from rife_tpu.models.registry import MODEL_REGISTRY
from rife_tpu.ops import use_warp_impl
from rife_tpu.ops.pallas.warp_v5 import _tile_scalars_v5, _tile_scalars_v5_pl

key = jax.random.PRNGKey(0)
img0 = jax.random.uniform(key, (B, H, W, 3), jnp.bfloat16)
img1 = jax.random.uniform(jax.random.PRNGKey(1), (B, H, W, 3), jnp.bfloat16)

# scalar-prep micro: NHWC vs plane layout
flow = jax.random.uniform(key, (B, H, W, 2), jnp.float32) * 8
flow_pl = jnp.moveaxis(flow, -1, 1)


def bench_scalars(name, fn, *args):
    @jax.jit
    def chained(*a):
        def body(i, c):
            sc, rb = fn(a[0] + (c * 1e-12).astype(a[0].dtype), *a[1:])
            return (jnp.sum(sc) + jnp.sum(rb)).astype(jnp.float32) * 1e-20
        return lax.fori_loop(0, 50, body, jnp.zeros((), jnp.float32))
    t0 = time.perf_counter(); float(chained(*args)); comp = time.perf_counter() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); float(chained(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best/50*1e3:.3f} ms  (compile {comp:.0f}s)", flush=True)


bench_scalars("tile_scalars_v5 NHWC flow",
              lambda f: _tile_scalars_v5(f, H, W, H, W, 256, 32), flow)
bench_scalars("tile_scalars_v5 plane flow",
              lambda f: _tile_scalars_v5_pl(f, H, W, H, W, 256, 32), flow_pl)


def bench_model(tag, fast):
    d = MODEL_REGISTRY["rife"]
    cfg = d.config
    if fast:
        from dataclasses import replace
        cfg = replace(cfg, fast_level0=True)
    params = d.init(jax.random.PRNGKey(0), cfg)
    with use_warp_impl("pallas"):
        @jax.jit
        def chained(params, a, b):
            def body(i, a):
                out = d.apply(params, a, b, scale_list=d.scale_list, cfg=cfg)
                return out["merged"][-1]
            return jnp.mean(lax.fori_loop(0, ITERS, body, a))

        t0 = time.perf_counter()
        float(chained(params, img0, img1))
        comp = time.perf_counter() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(chained(params, img0, img1))
            best = min(best, time.perf_counter() - t0)
    fps = B * ITERS / best
    print(f"{tag}: {best/ITERS*1e3/B:.2f} ms/frame  {fps:.1f} fps/chip"
          f"  (compile {comp:.0f}s)", flush=True)


bench_model("plane-glue exact", fast=False)
bench_model("plane-glue fast", fast=True)
print("done", flush=True)
