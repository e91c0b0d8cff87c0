"""Exp27: conv H-tiling ON vs OFF, full exact graph.

The exp25 trace + exp26 HLO show the H-tiled conv path's halo
concat/reshape assembly materialising as ~168 layout copies totalling
12.8 ms/iter (22% of the iteration) — every big copy's metadata points
at nn/tiled.py.  Tiling won its per-op comparisons (2-5x, round 2),
but the full graph may prefer plain convs whose surroundings XLA can
fuse without the copies.
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from jax import lax
from rife_tpu.models.registry import MODEL_REGISTRY
from rife_tpu.nn.layers import use_conv_tiling
from rife_tpu.ops import use_warp_impl

print("backend:", jax.default_backend(), flush=True)
B, H, W, K = 4, 736, 1280, 20
d = MODEL_REGISTRY["rife"]
params = d.init(jax.random.PRNGKey(0), d.config)
img0 = jax.random.uniform(jax.random.PRNGKey(1), (B, H, W, 3), jnp.bfloat16)
img1 = jax.random.uniform(jax.random.PRNGKey(2), (B, H, W, 3), jnp.bfloat16)


def bench(name, tiling):
    with use_conv_tiling(tiling), use_warp_impl("pallas"):
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


bench("conv tiling OFF", False)
bench("conv tiling ON (control)", True)
print("done", flush=True)
