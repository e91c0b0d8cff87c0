"""Exp31: resolution scaling of the exact graph (1080p, 4K warp).

Validates the adaptive tile_w threshold at production widths
(1920 -> 2-block programs, wp 2048; 3840 -> %256-aligned) and records
fps at 1080p for PERFORMANCE.md.  4K full-graph at b1 also checks the
96-row-window VMEM story beyond 1080p.
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from jax import lax
from rife_tpu.models.registry import MODEL_REGISTRY
from rife_tpu.ops import use_warp_impl

print("backend:", jax.default_backend(), flush=True)
d = MODEL_REGISTRY["rife"]
params = d.init(jax.random.PRNGKey(0), d.config)


def bench(name, b, h, w, k=10):
    img0 = jax.random.uniform(jax.random.PRNGKey(1), (b, h, w, 3), jnp.bfloat16)
    img1 = jax.random.uniform(jax.random.PRNGKey(2), (b, h, w, 3), jnp.bfloat16)
    with use_warp_impl("pallas"):
        @jax.jit
        def loop(p, a, bb):
            def body(i, a_):
                out = d.apply(p, a_, bb, scale_list=d.scale_list, cfg=d.config)
                return out["merged"][-1]
            return jnp.mean(lax.fori_loop(0, k, body, a))

        t0 = time.perf_counter(); float(loop(params, img0, img1))
        comp = time.perf_counter() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter(); float(loop(params, img0, img1))
            best = min(best, time.perf_counter() - t0)
    ms = best * 1000 / k
    print(f"{name}: {ms:.2f} ms/iter  ({b / ms * 1000:.2f} fps/chip)  "
          f"(compile {comp:.0f}s)", flush=True)


bench("1080p (1088x1920) b2 exact", 2, 1088, 1920)
bench("4K (2176x3840) b1 exact", 1, 2176, 3840, k=6)
print("done", flush=True)
