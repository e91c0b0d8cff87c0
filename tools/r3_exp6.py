"""Round-3 experiment 6 (TPU): cost attribution for warp scalar-prep and
every resize the 720p b4 exact graph performs, measured chained-in-jit.

Motivation: docs/PERFORMANCE.md puts resizes at ~6 ms/iter vs a ~0.5 ms
traffic bound and _tile_scalars at ~1 ms per warp call; this script
pins down which instances actually cost, so pallas effort goes where
the milliseconds are.
"""
import os, sys, time, functools
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from jax import lax

from rife_tpu.ops import resize_bilinear, scale_by
from rife_tpu.ops.pallas.warp import _tile_scalars
from rife_tpu.ops.pallas.warp_v5 import _tile_scalars_v5

print("backend:", jax.default_backend(), flush=True)

B, H, W = 4, 736, 1280
ITERS = 50


def bench(name, fn, *args):
    @jax.jit
    def chained(*a):
        def body(i, carry):
            out = fn(*(x + (carry * 1e-12).astype(x.dtype)
                       if x.dtype != jnp.int32 else x for x in a))
            if isinstance(out, tuple):
                out = sum(jnp.sum(o.astype(jnp.float32)) for o in out)
            else:
                out = jnp.sum(out.astype(jnp.float32))
            return out * 1e-20
        return lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))
    try:
        t0 = time.perf_counter()
        float(chained(*args))
        comp = time.perf_counter() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(chained(*args))
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {best/ITERS*1e3:.3f} ms   (compile {comp:.0f}s)", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)


key = jax.random.PRNGKey(0)


def rnd(shape, dt=jnp.bfloat16):
    return jax.random.uniform(key, shape, dt)


# ---- scalar prep at the real warp-call shapes --------------------------
flow_full = rnd((B, H, W, 2), jnp.float32)
flow_full8 = rnd((2 * B, H, W, 2), jnp.float32)
bench("tile_scalars img b4 720p (win256)",
      lambda f: _tile_scalars(f, H, W, H, W, 64, 256), flow_full)
bench("tile_scalars feat b8 368x640",
      lambda f: _tile_scalars(f, H // 2, W // 2, H // 2, W // 2 , 64, 256),
      rnd((2 * B, H // 2, W // 2, 2), jnp.float32))
bench("tile_scalars_v5 img b4 720p",
      lambda f: _tile_scalars_v5(f, H, W, H, W, 256, 32), flow_full)

# ---- every resize instance in the exact 720p graph ---------------------
cases = [
    ("down x4  6ch 736x1280->184x320", (B, H, W, 6), (H // 4, W // 4)),
    ("up   x8  5ch 92x160->736x1280", (B, H // 8, W // 8, 5), (H, W)),
    ("down x2 17ch 736x1280 (mean)", (B, H, W, 17), (H // 2, W // 2)),
    ("down x2  4ch flow 736x1280 (mean)", (B, H, W, 4), (H // 2, W // 2)),
    ("up   x4  5ch 184x320->736x1280", (B, H // 4, W // 4, 5), (H, W)),
    ("up   x2  5ch 368x640->736x1280", (B, H // 2, W // 2, 5), (H, W)),
    ("ctx flow halvings 2ch b8 (4 levels)", None, None),
]
import numpy as np


def _bilin_k(f):
    t = np.arange(2 * f, dtype=np.float32)
    return np.maximum(0.0, 1.0 - np.abs(t - (f - 0.5)) / f)


def deconv_up(x, f, separable=False):
    """Exact half-pixel xf bilinear upsample as a (lhs-dilated) conv with
    an edge-replicate pre-pad; numerically validated vs resize_bilinear
    (max diff 1.8e-7 f32)."""
    n, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    K = _bilin_k(f)
    pad = 3 * f // 2 - 1
    dn = ("NHWC", "HWIO", "NHWC")
    eye = np.eye(c, dtype=np.float32)
    if separable:
        kh = jnp.asarray(K[:, None, None, None] * eye[None])
        kw = jnp.asarray(K[None, :, None, None] * eye[None])
        out = lax.conv_general_dilated(
            xp.astype(jnp.float32), kh, (1, 1), [(pad, pad), (0, 0)],
            lhs_dilation=(f, 1), dimension_numbers=dn)
        out = lax.conv_general_dilated(
            out, kw, (1, 1), [(0, 0), (pad, pad)],
            lhs_dilation=(1, f), dimension_numbers=dn)
    else:
        k2 = np.outer(K, K)
        ker = jnp.asarray(k2[:, :, None, None] * eye[None, None])
        out = lax.conv_general_dilated(
            xp.astype(jnp.float32), ker, (1, 1), [(pad, pad)] * 2,
            lhs_dilation=(f, f), dimension_numbers=dn)
    return out[:, f:f + f * h, f:f + f * w, :].astype(x.dtype)


def conv_down2(x, depthwise):
    c = x.shape[-1]
    if depthwise:
        ker = jnp.full((2, 2, 1, c), 0.25, jnp.float32)
        g = c
    else:
        ker = jnp.asarray(
            0.25 * np.eye(c, dtype=np.float32)[None, None].repeat(2, 0).repeat(2, 1))
        g = 1
    return lax.conv_general_dilated(
        x.astype(jnp.float32), ker, (2, 2), "VALID", feature_group_count=g,
        dimension_numbers=("NHWC", "HWIO", "NHWC")).astype(x.dtype)


conv_cases = [
    ("up x8 deconv dense  5ch", lambda x: deconv_up(x, 8), (B, H // 8, W // 8, 5)),
    ("up x8 deconv separable 5ch", lambda x: deconv_up(x, 8, True), (B, H // 8, W // 8, 5)),
    ("up x4 deconv separable 5ch", lambda x: deconv_up(x, 4, True), (B, H // 4, W // 4, 5)),
    ("up x2 deconv separable 5ch", lambda x: deconv_up(x, 2, True), (B, H // 2, W // 2, 5)),
    ("down2 depthwise conv 17ch", lambda x: conv_down2(x, True), (B, H, W, 17)),
    ("down2 dense conv 17ch", lambda x: conv_down2(x, False), (B, H, W, 17)),
]

for name, shape, out_hw in cases:
    if shape is None:
        def ctx_flows(f):
            outs = []
            fl = f
            for _ in range(4):
                fl = scale_by(fl, 0.5) * 0.5
                outs.append(fl)
            return tuple(outs)
        bench(name, ctx_flows, rnd((2 * B, H, W, 2), jnp.float32))
        continue
    bench(name, functools.partial(resize_bilinear, out_hw=out_hw), rnd(shape))

for name, fn, shape in conv_cases:
    bench(name, fn, rnd(shape))

print("done", flush=True)
