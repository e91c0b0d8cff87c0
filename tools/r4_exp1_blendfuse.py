"""r4 exp1: warp-epilogue fusion (VERDICT r3 next #2) full-graph A/B.

Measures the exact paper graph, the fast paper graph, and v4.25
exact/fast at the headline config (720p, b4, bf16, pallas warps), with
the fused pair-warp+sigmoid-blend epilogue ON vs OFF
(ops/warp.py `_FUSE_BLEND`).  Chained-in-jit per CLAUDE.md.
"""
import os, sys, time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import dataclasses

import jax, jax.numpy as jnp
from jax import lax

from rife_tpu.models.registry import MODEL_REGISTRY
from rife_tpu.ops import use_warp_impl
from rife_tpu.ops.warp import _FUSE_BLEND

print("backend:", jax.default_backend(), flush=True)
B, K = 4, 20


def measure(name, d, h, w):
    img0 = jax.random.uniform(jax.random.PRNGKey(1), (B, h, w, 3), jnp.bfloat16)
    img1 = jax.random.uniform(jax.random.PRNGKey(2), (B, h, w, 3), jnp.bfloat16)
    params = d.init(jax.random.PRNGKey(0), d.config)
    for fuse in (True, False):
        tok = _FUSE_BLEND.set(fuse)
        try:
            with use_warp_impl("pallas"):
                @jax.jit
                def loop(p, a, b):
                    def body(i, a_):
                        out = d.apply(p, a_, b, scale_list=d.scale_list,
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
            print(f"{name} fuse={fuse}: {ms:.2f} ms/iter "
                  f"({B / ms * 1000:.1f} fps/chip) (compile {comp:.0f}s)",
                  flush=True)
        finally:
            _FUSE_BLEND.reset(tok)


def fastdef(d):
    return dataclasses.replace(d, config=dataclasses.replace(
        d.config, fast_level0=True))


rife = MODEL_REGISTRY["rife"]
v425 = MODEL_REGISTRY["v4.25"]
measure("rife exact 736p", rife, 736, 1280)
measure("rife fast 736p", fastdef(rife), 736, 1280)
measure("v4.25 exact 768p", v425, 768, 1280)
measure("v4.25 fast 768p", fastdef(v425), 768, 1280)
print("done", flush=True)
