"""Exp18: phase-form U-Net boundary lowerings, measured FULL-GRAPH.

exp10's lesson: isolated conv-probe results do not transfer — measure
the whole exact 720p b4 bf16 graph per variant.  Variants toggle
refine._PHASE_OVERRIDE (both boundary ends together; the granular
ablation only matters if the combined result disappoints).

Baseline (phase off) = the 67.9 fps graph of exp13.
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from jax import lax
from rife_tpu.models.registry import MODEL_REGISTRY
from rife_tpu.models import refine
from rife_tpu.ops import use_warp_impl

print("backend:", jax.default_backend(), flush=True)
B, H, W, K = 4, 736, 1280, 20
d = MODEL_REGISTRY["rife"]
params = d.init(jax.random.PRNGKey(0), d.config)
img0 = jax.random.uniform(jax.random.PRNGKey(1), (B, H, W, 3), jnp.bfloat16)
img1 = jax.random.uniform(jax.random.PRNGKey(2), (B, H, W, 3), jnp.bfloat16)


def bench(name, phase_flag):
    refine._PHASE_OVERRIDE = phase_flag
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


bench("full exact, phase unet OFF (baseline)", False)
bench("full exact, phase unet ON", True)
print("done", flush=True)
