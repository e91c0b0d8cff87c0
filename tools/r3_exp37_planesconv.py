"""Exp37: plane-consuming boundary convs (nn/tiled.conv2d_tiled_planes).

The profiler trace (r3_exp25) charges 12.8 ms/iter to layout copies,
mostly the tiled-conv halo assembly + conv-input relayouts.  The plane
glue moves the halo'd row-tile assembly into the dense (N, C, H, W)
layout (full-bandwidth copies) and emits ONE transpose per boundary
conv instead of from_planes + a lane-sparse NHWC halo concat.  Covered
convs: the 3 block stems, U-Net down0.conv1, contextnet conv1.

Variants (full exact 720p b4 bf16 graph, K-chained in one jit):
- control: fallback glue (from_planes + conv2d) == the committed graph
- planes/take: static-index jnp.take tile assembly (current default)
- planes/concat: slice+pad+concat assembly (mirrors conv2d_tiled)
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
import jax.numpy as jnp
from jax import lax

from rife_tpu.models.registry import MODEL_REGISTRY
from rife_tpu.nn import layers, tiled
from rife_tpu.ops import use_warp_impl

print("backend:", jax.default_backend(), flush=True)
K = 20
B, H, W = 4, 736, 1280

d = MODEL_REGISTRY["rife"]
params = d.init(jax.random.PRNGKey(0), d.config)
img0 = jax.random.uniform(jax.random.PRNGKey(0), (B, H, W, 3), jnp.bfloat16)
img1 = jax.random.uniform(jax.random.PRNGKey(1), (B, H, W, 3), jnp.bfloat16)

_real_planes = layers.conv2d_planes
_real_tiled_planes = tiled.conv2d_tiled_planes


def _fallback_planes(x_pl, p, stride=1):
    return layers.conv2d(jnp.moveaxis(x_pl, 1, -1), p, stride=stride)


def bench(name):
    with use_warp_impl("pallas"):
        @jax.jit
        def loop(params, a, b):
            def body(i, a):
                out = d.apply(params, a, b, scale_list=d.scale_list,
                              cfg=d.config)
                return out["merged"][-1]
            return jnp.mean(lax.fori_loop(0, K, body, a))

        t0 = time.perf_counter(); float(loop(params, img0, img1))
        comp = time.perf_counter() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter(); float(loop(params, img0, img1))
            best = min(best, time.perf_counter() - t0)
    ms = best * 1000 / K
    print(f"{name}: {ms:.2f} ms/iter  ({B * K / best:.1f} fps/chip)"
          f"  (compile {comp:.0f}s)", flush=True)


layers.conv2d_planes = _fallback_planes
bench("control (from_planes glue)")

layers.conv2d_planes = _real_planes
bench("planes/take")

tiled.conv2d_tiled_planes = functools.partial(_real_tiled_planes,
                                              mode="concat")
bench("planes/concat")
print("done", flush=True)
