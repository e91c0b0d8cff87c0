"""Exp48: bisect the exp47 regression (fast 52.1 -> 59.2) across the
three glue changes: (A) plane_down_int f==2 -> plane_down2 dispatch,
(B) fused pixel_shuffle_planes, (C) weight-permuted packed stacks.
"""
import os, sys, time, dataclasses, functools
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from jax import lax
from rife_tpu.models.registry import MODEL_REGISTRY
from rife_tpu.models import v425 as V
from rife_tpu.ops import resize as R
from rife_tpu.nn import layers as L
from rife_tpu.ops import use_warp_impl, to_planes

print("backend:", jax.default_backend(), flush=True)
B, H, W, K = 4, 768, 1280, 20
d = MODEL_REGISTRY["v4.25"]
cfg = dataclasses.replace(d.config, fast_level0=True)
params = d.init(jax.random.PRNGKey(0), d.config)
img0 = jax.random.uniform(jax.random.PRNGKey(1), (B, H, W, 3), jnp.bfloat16)
img1 = jax.random.uniform(jax.random.PRNGKey(2), (B, H, W, 3), jnp.bfloat16)

orig_pdi = R.plane_down_int
orig_psp = L.pixel_shuffle_planes
orig_perm = V._perm_stem


def pdi_nodispatch(p, f):
    if f == 1:
        return p
    assert f % 2 == 0, f
    n, c, h, w = p.shape
    half = jnp.asarray(0.5, p.dtype)
    x = p.reshape(n, c, h // f, f, w)
    x = (x[:, :, :, f // 2 - 1] + x[:, :, :, f // 2]) * half
    x = x.reshape(n, c, h // f, w // f, f)
    return (x[..., f // 2 - 1] + x[..., f // 2]) * half


def psp_unfused(x, r=2):
    return to_planes(L.pixel_shuffle(x, r))


# NOTE: identity perm changes channel semantics but not shapes/timing.
def perm_off(p, cin):
    return p


def set_toggles(A, B, C):
    # v425 imported these by name: patch its module globals
    V.plane_down_int = orig_pdi if A else pdi_nodispatch
    V.pixel_shuffle_planes = orig_psp if B else psp_unfused
    V._perm_stem = orig_perm if C else perm_off


def bench(name, A, B, C):
    set_toggles(A, B, C)
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
    print(f"{name}: {ms:.2f} ms/iter  ({4 / ms * 1000:.1f} fps)"
          f"  (compile {comp:.0f}s)", flush=True)


bench("control (all off)", False, False, False)
bench("A only (down2 dispatch)", True, False, False)
bench("B only (fused shuffle)", False, True, False)
bench("C only (weight perm)", False, False, True)
print("done", flush=True)
