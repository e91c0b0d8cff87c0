"""Exp28: adaptive warp tile_w + TILE_ROWS sweep, full exact graph.

- tile_w: programs are now 128 lanes wide when W %% 256 != 0, so the
  narrow feature-warp levels (320/640/160/80 wide) stop running 20-60%%
  pad subtiles (exp26 HLO showed f32[8,2,192,512] pads).
- TILE_ROWS: the tiled-conv fold granularity (16) was chosen per-op in
  round 2; the trace shows its halo-assembly copies cost 10.6 ms/iter
  in-graph — sweep 8/32 for the full-graph optimum.

Baseline: 58.8-58.9 ms/iter (exp18/27 control).
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from jax import lax
from rife_tpu.models.registry import MODEL_REGISTRY
from rife_tpu.nn import tiled
from rife_tpu.ops import use_warp_impl

print("backend:", jax.default_backend(), flush=True)
B, H, W, K = 4, 736, 1280, 20
d = MODEL_REGISTRY["rife"]
params = d.init(jax.random.PRNGKey(0), d.config)
img0 = jax.random.uniform(jax.random.PRNGKey(1), (B, H, W, 3), jnp.bfloat16)
img1 = jax.random.uniform(jax.random.PRNGKey(2), (B, H, W, 3), jnp.bfloat16)


def bench(name, tile_rows):
    tiled.TILE_ROWS = tile_rows
    with use_warp_impl("pallas"):
        @jax.jit
        def loop(p, a, b):
            def body(i, a_):
                out = d.apply(p, a_, b, scale_list=d.scale_list, cfg=d.config)
                return out["merged"][-1]
            return jnp.mean(lax.fori_loop(0, K, body, a))

        t0 = time.perf_counter(); float(loop(params, img0, img1))
        comp = time.perf_counter() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter(); float(loop(params, img0, img1))
            best = min(best, time.perf_counter() - t0)
    ms = best * 1000 / K
    print(f"{name}: {ms:.2f} ms/iter  ({B / ms * 1000:.1f} fps)  "
          f"(compile {comp:.0f}s)", flush=True)


bench("tile_w adaptive, TILE_ROWS=16", 16)
bench("tile_w adaptive, TILE_ROWS=32", 32)
bench("tile_w adaptive, TILE_ROWS=8", 8)
print("done", flush=True)
