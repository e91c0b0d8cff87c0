"""Exp41: validate the plane-stem refactor (conv_prelu_planes stems in
ifnet/refine + plane_down_int block0/UHD downsamples) on the full exact
and fast graphs.  Baseline: 57.0 ms/iter exact (70.2 fps) / 53.0 fast
(75.4 fps), exp28/exp29.
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from jax import lax
from rife_tpu.models.registry import MODEL_REGISTRY
from rife_tpu.ops import use_warp_impl

print("backend:", jax.default_backend(), flush=True)
H, W, K, B = 736, 1280, 20, 4
d = MODEL_REGISTRY["rife"]
params = d.init(jax.random.PRNGKey(0), d.config)
img0 = jax.random.uniform(jax.random.PRNGKey(1), (B, H, W, 3), jnp.bfloat16)
img1 = jax.random.uniform(jax.random.PRNGKey(2), (B, H, W, 3), jnp.bfloat16)


def bench(name, fast):
    import dataclasses
    cfg = dataclasses.replace(d.config, fast_level0=fast) if fast else d.config
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
    print(f"{name}: {ms:.2f} ms/iter  ({B * 1000 / ms:.1f} fps/chip)"
          f"  (compile {comp:.0f}s)", flush=True)


bench("exact plane-stems", fast=False)
bench("fast plane-stems", fast=True)
print("done", flush=True)
