"""Exp22: nrows-chunked v5 row loop (bit-identical, fewer row-gathers).

Nearly every subtile's weighted row span is ~9-10 of the 16 rows the
y2-predicated pieces execute; the chunked form runs piece 1 as a 2-row
chunk unless nr >= 11.  Verified bit-identical to the old kernel in
interpret mode at flow magnitudes 0.9/4/12/30.

Measures: isolated image-pair warp (n=8, c=3, 720p), isolated feature
warp (c=16 @ 368x640 b8), and the FULL exact graph (phase lowerings
OFF to isolate the kernel delta vs the 58.8 ms baseline).
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from jax import lax
from rife_tpu.ops.pallas.warp_v5 import warp_pallas_v5_pl
from rife_tpu.models.registry import MODEL_REGISTRY
from rife_tpu.models import refine
from rife_tpu.ops import use_warp_impl

print("backend:", jax.default_backend(), flush=True)
K = 30


def bench_warp(name, n, c, h, w, mag=8.0):
    img = jax.random.uniform(jax.random.PRNGKey(0), (n, c, h, w), jnp.bfloat16)
    base = jax.random.uniform(jax.random.PRNGKey(1), (n, 2, h // 8, w // 8),
                              jnp.float32, -mag, mag)
    flow = jnp.repeat(jnp.repeat(base, 8, 2), 8, 3)

    @jax.jit
    def loop(img, flow):
        def body(i, a):
            o = warp_pallas_v5_pl(a, flow)
            return (a + o.astype(a.dtype) * 1e-6)
        return jnp.mean(lax.fori_loop(0, K, body, img))

    t0 = time.perf_counter(); float(loop(img, flow))
    comp = time.perf_counter() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); float(loop(img, flow))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best * 1000 / K:.3f} ms/call  (compile {comp:.0f}s)",
          flush=True)


bench_warp("image pair warp n8 c3 720p", 8, 3, 736, 1280)
bench_warp("feature warp c16 368x640 n8", 8, 16, 368, 640)

B, H, W, KF = 4, 736, 1280, 20
d = MODEL_REGISTRY["rife"]
params = d.init(jax.random.PRNGKey(0), d.config)
img0 = jax.random.uniform(jax.random.PRNGKey(1), (B, H, W, 3), jnp.bfloat16)
img1 = jax.random.uniform(jax.random.PRNGKey(2), (B, H, W, 3), jnp.bfloat16)
refine._PHASE_OVERRIDE = False
with use_warp_impl("pallas"):
    @jax.jit
    def loop(p, a, b):
        def body(i, a_):
            out = d.apply(p, a_, b, scale_list=d.scale_list, cfg=d.config)
            return out["merged"][-1]
        return jnp.mean(lax.fori_loop(0, KF, body, a))

    t0 = time.perf_counter(); float(loop(params, img0, img1))
    comp = time.perf_counter() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); float(loop(params, img0, img1))
        best = min(best, time.perf_counter() - t0)
ms = best * 1000 / KF
print(f"full exact, chunked v5 (phase off): {ms:.2f} ms/iter  "
      f"({B / ms * 1000:.1f} fps)  (compile {comp:.0f}s)", flush=True)
print("done", flush=True)
