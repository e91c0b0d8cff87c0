"""Exp20: granular full-graph ablation of the phase-form lowerings.

exp18 measured the combined unet-phase at 152 ms/iter vs 58.8 baseline —
a catastrophic regression with the .at[].set weight transforms (16
strided dynamic-update-slices per loop iteration; XLA does not hoist
out of while-loops).  The transforms are now einsums against constant
selection tensors; this measures each part separately to find what (if
anything) still hurts.
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


def bench(name, parts):
    refine._PHASE_PARTS = parts
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


bench("phase parts=up3 (einsum transforms)", {"up3"})
bench("phase parts=down0", {"down0"})
bench("phase parts=stems", {"stems"})
bench("phase parts=all", {"up3", "down0", "stems"})
print("done", flush=True)
