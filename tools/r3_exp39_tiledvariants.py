"""Exp39: attack the tiled-conv halo-assembly copies (12.8 ms trace cat).

Three full-graph ablations of nn/tiled.conv2d_tiled's dispatch/assembly
(monkeypatched here — product code unchanged until a variant wins):

1. take-assembly: ONE static-index jnp.take on the padded tensor
   instead of slice+pad+concat (maybe fewer/better-fused copies).
2. untile cin > 64: the dense convblock chains (c=90 at 368x640) pay a
   full-tensor halo copy PER CONV; tiled.py's own table says 90ch
   tiling is worse at 59k px — maybe it's net-negative at 235k too and
   only the lane-sparse boundary convs need tiling.
3. untile cin > 32: also untiles U-Net interior convs.

Control = tools/r3_exp38_trace2.py's headline on the same tree.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from jax import lax

from rife_tpu.models.registry import MODEL_REGISTRY
from rife_tpu.nn import tiled
from rife_tpu.ops import use_warp_impl

print("backend:", jax.default_backend(), flush=True)
K = 20
B, H, W = 4, 736, 1280

d = MODEL_REGISTRY["rife"]
params = d.init(jax.random.PRNGKey(0), d.config)
img0 = jax.random.uniform(jax.random.PRNGKey(0), (B, H, W, 3), jnp.bfloat16)
img1 = jax.random.uniform(jax.random.PRNGKey(1), (B, H, W, 3), jnp.bfloat16)

_orig = tiled.conv2d_tiled


def conv2d_tiled_take(x, w, stride, precision, T=None):
    T = T or tiled.TILE_ROWS
    n, h, wd, c = x.shape
    s = stride
    Ti = T * s
    nt = -(-h // Ti)
    hp = nt * Ti
    rows = Ti + (2 if s == 1 else 1)
    pad_bot = hp - h + (1 if s == 1 else 0)
    xp = jnp.pad(x, ((0, 0), (1, pad_bot), (0, 0), (0, 0)))
    idx = (jnp.arange(nt)[:, None] * Ti + jnp.arange(rows)[None, :]).reshape(-1)
    tiles = jnp.take(xp, idx, axis=1).reshape(n * nt, rows, wd, c)
    y = lax.conv_general_dilated(
        tiles, w, (s, s), ((0, 0), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision,
        preferred_element_type=x.dtype,
    ).astype(x.dtype)
    y = y.reshape(n, nt * T, -1, w.shape[-1])
    return y[:, :h // s]


def conv2d_tiled_take_valid(x, w, stride, precision, T=None):
    """take-assembly + W pre-padded in the same pad op -> fully VALID
    conv (no in-conv padding selects)."""
    T = T or tiled.TILE_ROWS
    n, h, wd, c = x.shape
    s = stride
    Ti = T * s
    nt = -(-h // Ti)
    hp = nt * Ti
    rows = Ti + (2 if s == 1 else 1)
    pad_bot = hp - h + (1 if s == 1 else 0)
    xp = jnp.pad(x, ((0, 0), (1, pad_bot), (1, 1), (0, 0)))
    idx = (jnp.arange(nt)[:, None] * Ti + jnp.arange(rows)[None, :]).reshape(-1)
    tiles = jnp.take(xp, idx, axis=1).reshape(n * nt, rows, wd + 2, c)
    y = lax.conv_general_dilated(
        tiles, w, (s, s), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision,
        preferred_element_type=x.dtype,
    ).astype(x.dtype)
    y = y.reshape(n, nt * T, -1, w.shape[-1])
    return y[:, :h // s]


def untile_over(max_cin):
    def f(x, w, stride, precision, T=None):
        if x.shape[-1] > max_cin:
            return lax.conv_general_dilated(
                x, w, (stride, stride), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=precision,
                preferred_element_type=x.dtype,
            ).astype(x.dtype)
        return _orig(x, w, stride, precision, T)
    return f


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


tiled.conv2d_tiled = conv2d_tiled_take
bench("take-assembly")

tiled.conv2d_tiled = conv2d_tiled_take_valid
bench("take-assembly + W-prepad VALID")

tiled.conv2d_tiled = untile_over(64)
bench("untile cin>64")

tiled.conv2d_tiled = untile_over(32)
bench("untile cin>32")
print("done", flush=True)
