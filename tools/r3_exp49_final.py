"""Exp49: (1) final v4.25 numbers with the kept exp48 winners (packed-
order stacks + weight-permuted stems; shuffle fusion and down2 dispatch
reverted); (2) the paper exact graph with plane_down2's reduce_window
swapped for the split-reshape 2-tap form (exp48 found reduce_window
LOSES on the v4.25 stacks — check whether that transfers).
"""
import os, sys, time, dataclasses
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from jax import lax
from rife_tpu.models.registry import MODEL_REGISTRY
from rife_tpu.models import ifnet as MI
from rife_tpu.models import refine as MR
from rife_tpu.ops import use_warp_impl

print("backend:", jax.default_backend(), flush=True)
K = 20


def bench(name, d, cfg, B, H, W):
    img0 = jax.random.uniform(jax.random.PRNGKey(1), (B, H, W, 3), jnp.bfloat16)
    img1 = jax.random.uniform(jax.random.PRNGKey(2), (B, H, W, 3), jnp.bfloat16)
    params = d.init(jax.random.PRNGKey(0), d.config)
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
    print(f"{name}: {ms:.2f} ms/iter  ({B / ms * 1000:.1f} fps)"
          f"  (compile {comp:.0f}s)", flush=True)


dv = MODEL_REGISTRY["v4.25"]
bench("v4.25 exact packed-order+perm", dv, dv.config, 4, 768, 1280)
bench("v4.25 fast packed-order+perm",
      dv, dataclasses.replace(dv.config, fast_level0=True), 4, 768, 1280)

dr = MODEL_REGISTRY["rife"]
bench("rife exact control", dr, dr.config, 4, 736, 1280)


def split_down2(p):
    n, c, h, w = p.shape
    half = jnp.asarray(0.5, p.dtype)
    x = p.reshape(n, c, h // 2, 2, w)
    x = (x[:, :, :, 0] + x[:, :, :, 1]) * half
    x = x.reshape(n, c, h // 2, w // 2, 2)
    return (x[..., 0] + x[..., 1]) * half


MI.plane_down2 = split_down2
bench("rife exact split-down2 (ifnet)", dr, dr.config, 4, 736, 1280)
MR.plane_down2 = split_down2
bench("rife exact split-down2 (ifnet+refine)", dr, dr.config, 4, 736, 1280)
print("done", flush=True)
