"""Op-level TPU microbenchmarks (used to steer Pallas kernel work).

Run in FOREGROUND on the axon tunnel (backgrounded processes hang), and
always force completion with a scalar fetch: block_until_ready() returns
early over the tunnel.

    python tools/profile_ops.py [baseline|warp|conv|ifnet|full|resize]...
"""
from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/rife_tpu_jit_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

B, H, W = 4, 736, 1280
DT = jnp.bfloat16


def bench(name, fn, *args, iters=10):
    float(fn(*args))
    float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(fn(*args))
    print(f"{name}: {(time.perf_counter()-t0)/iters*1000:.2f} ms/iter", flush=True)


def main(which):
    img = jax.random.uniform(jax.random.PRNGKey(0), (B, H, W, 3), DT)
    img2 = jax.random.uniform(jax.random.PRNGKey(1), (B, H, W, 3), DT)
    flow = (jax.random.uniform(jax.random.PRNGKey(2), (B, H, W, 2), DT) - 0.5) * 20

    if "baseline" in which:
        @jax.jit
        def baseline(a):
            return jnp.mean(a)

        bench("baseline RTT", baseline, img)

    if "warp" in which:
        from rife_tpu.ops import warp

        @jax.jit
        def warp_m(a, f):
            return jnp.mean(warp(a, f))

        bench("warp 720p b4 c3", warp_m, img, flow)

    if "conv" in which:
        from rife_tpu.nn import conv_prelu

        x90 = jax.random.uniform(jax.random.PRNGKey(3), (B, H // 4, W // 4, 90), DT)
        cp = {
            "conv": {
                "w": jax.random.normal(jax.random.PRNGKey(4), (3, 3, 90, 90), jnp.float32) * 0.05,
                "b": jnp.zeros((90,), jnp.float32),
            },
            "alpha": jnp.full((90,), 0.25, jnp.float32),
        }

        @jax.jit
        def conv8(x):
            for _ in range(8):
                x = conv_prelu(x, cp)
            return jnp.mean(x)

        bench("8x conv c90 @1/4res", conv8, x90)

    if "resize" in which:
        from rife_tpu.ops import resize_bilinear

        @jax.jit
        def down4(a):
            return jnp.mean(resize_bilinear(a, (H // 4, W // 4)))

        bench("resize 1/4 720p", down4, img)

        @jax.jit
        def up8(a):
            return jnp.mean(resize_bilinear(a, (H, W)))

        small = jax.random.uniform(jax.random.PRNGKey(5), (B, H // 8, W // 8, 5), DT)
        bench("resize x8 5ch", up8, small)

    if "ifnet" in which:
        from rife_tpu.models.ifnet import ifnet_apply
        from rife_tpu.models.registry import MODEL_REGISTRY

        d = MODEL_REGISTRY["rife"]
        params = d.init(jax.random.PRNGKey(0), d.config)

        @jax.jit
        def no_refine(params, a, b):
            return jnp.mean(ifnet_apply(params, a, b, cfg=d.config, refine=False)["merged"][-1])

        bench("ifnet no-refine", no_refine, params, img, img2)

    if "full" in which:
        from rife_tpu.models.ifnet import ifnet_apply
        from rife_tpu.models.registry import MODEL_REGISTRY

        d = MODEL_REGISTRY["rife"]
        params = d.init(jax.random.PRNGKey(0), d.config)

        @jax.jit
        def full(params, a, b):
            return jnp.mean(ifnet_apply(params, a, b, cfg=d.config)["merged"][-1])

        bench("ifnet full", full, params, img, img2)


if __name__ == "__main__":
    main(sys.argv[1:] or ["baseline", "warp", "conv", "resize"])
