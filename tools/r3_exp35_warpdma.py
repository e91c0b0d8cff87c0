"""Exp35: is the v5 warp window-DMA-bound?

The v5 window BlockSpec is full-width (wp) per program while programs
tile the width at tile_w=256 -> at 720p each 32-row band's 96-row
window is fetched ntw=5 times (plus ~3x vertical overlap between
adjacent bands).  If the kernel is DMA-bound rather than select-bound,
widening tile_w (fewer width-programs, same windows) should show it:
tile_w=1280 cuts horizontal window traffic 5x with identical compute.

Probes (isolated pair-call shapes as the exact graph uses them):
- image pair warp: n=8 (pair-concat), c=3, 736x1280
- feature pair warp: n=8, c=16, 368x640
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from jax import lax
from rife_tpu.ops.pallas.warp_v5 import warp_pallas_v5_pl

print("backend:", jax.default_backend(), flush=True)
K = 50


def smooth_flow(key, n, h, w, mag=15.0):
    f = jax.random.uniform(key, (n, 2, h // 32 + 1, w // 32 + 1), jnp.float32,
                           -1.0, 1.0)
    f = jax.image.resize(f, (n, 2, h, w), "bilinear")
    return f * mag


def bench(name, n, c, h, w, tile_w):
    img = jax.random.uniform(jax.random.PRNGKey(0), (n, c, h, w), jnp.bfloat16)
    flow = smooth_flow(jax.random.PRNGKey(1), n, h, w)

    @jax.jit
    def loop(img, flow):
        def body(i, x):
            return warp_pallas_v5_pl(x, flow, tile_w_override=tile_w)
        return jnp.mean(lax.fori_loop(0, K, body, img).astype(jnp.float32))

    t0 = time.perf_counter(); float(loop(img, flow))
    comp = time.perf_counter() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); float(loop(img, flow))
        best = min(best, time.perf_counter() - t0)
    ms = best * 1000 / K
    print(f"{name}: {ms:.3f} ms/call  (compile {comp:.0f}s)", flush=True)


bench("img  pair 8x3x736x1280 tile_w=256 (current)", 8, 3, 736, 1280, 256)
bench("img  pair 8x3x736x1280 tile_w=640", 8, 3, 736, 1280, 640)
bench("img  pair 8x3x736x1280 tile_w=1280", 8, 3, 736, 1280, 1280)
bench("feat pair 8x16x368x640 tile_w=256 (current)", 8, 16, 368, 640, 256)
bench("feat pair 8x16x368x640 tile_w=640", 8, 16, 368, 640, 640)
print("done", flush=True)
