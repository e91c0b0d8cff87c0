"""Exp29: tile_w narrow-width threshold (<=384), exact + fast graphs.

Exp28's always-narrow rule regressed the fast graph (54.8 -> 67.6
ms/iter): programs' row-window DMA is full-width, so 1-block programs
at w=640 re-fetch each window 1.67x more.  The threshold keeps the
narrow-program win at 320/160/80 and restores 2-block programs at 640.
Expected: exact <= 57.0, fast back under ~55.
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from dataclasses import replace
import jax, jax.numpy as jnp
from jax import lax
from rife_tpu.models.registry import MODEL_REGISTRY
from rife_tpu.ops import use_warp_impl

print("backend:", jax.default_backend(), flush=True)
B, H, W, K = 4, 736, 1280, 20
d = MODEL_REGISTRY["rife"]
params = d.init(jax.random.PRNGKey(0), d.config)
img0 = jax.random.uniform(jax.random.PRNGKey(1), (B, H, W, 3), jnp.bfloat16)
img1 = jax.random.uniform(jax.random.PRNGKey(2), (B, H, W, 3), jnp.bfloat16)


def bench(name, cfg):
    with use_warp_impl("pallas"):
        @jax.jit
        def loop(p, a, b):
            def body(i, a_):
                out = d.apply(p, a_, b, scale_list=d.scale_list, cfg=cfg)
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


bench("exact, tile_w<=384 threshold", d.config)
bench("fast,  tile_w<=384 threshold", replace(d.config, fast_level0=True))
print("done", flush=True)
