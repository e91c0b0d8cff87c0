"""Exp43: are the in-graph image warps window-DMA-bound?

Each v5 program DMAs a full-width 96-row window; at 720p tile_w=256
that refetches every window row-band ntw=5 times (~1.3 GB -> ~1.6 ms
per image-pair call at bandwidth).  exp35 measured full-width programs
only ~2-8% faster — but with NOISE flows, where the select compute is
maximal and hides the DMA.  Model flows are smooth (skip predicates
fire, compute drops), so DMA may dominate in-graph.  Re-measure with
smooth upsampled-coarse flows (the realistic case) at tile_w = 256 /
640 / 1280.
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from jax import lax
from rife_tpu.ops.pallas.warp_v5 import warp_pallas_v5_pl
from rife_tpu.ops.resize import resize_bilinear

print("backend:", jax.default_backend(), flush=True)


def smooth_flow(key, n, h, w, mag):
    coarse = jax.random.normal(key, (n, h // 32, w // 32, 2), jnp.float32)
    return jnp.moveaxis(resize_bilinear(coarse * mag, (h, w)), -1, 1)


def bench(name, n, c, h, w, mag, tile_w, K=60):
    img = jax.random.uniform(jax.random.PRNGKey(0), (n, c, h, w),
                             jnp.bfloat16)
    flow = smooth_flow(jax.random.PRNGKey(1), n, h, w, mag)

    @jax.jit
    def loop(im, fl):
        def body(i, acc):
            out = warp_pallas_v5_pl(im, fl + acc * 1e-9,
                                    tile_w_override=tile_w)
            return acc + out[0, 0, 0, 0].astype(jnp.float32)
        return lax.fori_loop(0, K, body, jnp.float32(0.0))

    t0 = time.perf_counter(); float(loop(img, flow))
    comp = time.perf_counter() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); float(loop(img, flow))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best * 1000 / K:.3f} ms/call (compile {comp:.0f}s)",
          flush=True)


# image pair at full res (the 3 in-graph image warp2 calls look like this)
for tw in (256, 640, 1280):
    bench(f"imgpair 736x1280 mag8 tile_w={tw}", 8, 3, 736, 1280, 8.0, tw)
# stronger motion
bench("imgpair 736x1280 mag24 tile_w=256", 8, 3, 736, 1280, 24.0, 256)
bench("imgpair 736x1280 mag24 tile_w=1280", 8, 3, 736, 1280, 24.0, 1280)
print("done", flush=True)
