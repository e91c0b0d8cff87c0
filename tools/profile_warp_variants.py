"""Measure XLA gather formulations for the warp to pick the fast one."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/rife_tpu_jit_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

B, H, W, C = 4, 736, 1280, 3
DT = jnp.bfloat16


def bench(name, fn, *args, iters=10):
    try:
        float(fn(*args))
        float(fn(*args))
        t0 = time.perf_counter()
        for _ in range(iters):
            float(fn(*args))
        print(f"{name}: {(time.perf_counter()-t0)/iters*1000:.2f} ms/iter", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)


img = jax.random.uniform(jax.random.PRNGKey(0), (B, H, W, C), DT)
flow = (jax.random.uniform(jax.random.PRNGKey(2), (B, H, W, 2), DT) - 0.5) * 20


def coords(flow):
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    ix = jnp.clip(xs[None] + flow[..., 0].astype(jnp.float32), 0.0, W - 1)
    iy = jnp.clip(ys[None] + flow[..., 1].astype(jnp.float32), 0.0, H - 1)
    x0 = jnp.floor(ix); y0 = jnp.floor(iy)
    return (ix - x0), (iy - y0), x0.astype(jnp.int32), y0.astype(jnp.int32)


@jax.jit
def v1_flat_rowsC(img, flow):
    fx, fy, x0i, y0i = coords(flow)
    x1i = jnp.minimum(x0i + 1, W - 1)
    y1i = jnp.minimum(y0i + 1, H - 1)
    flat = img.reshape(B, H * W, C)
    def g(yi, xi):
        lin = (yi * W + xi).reshape(B, H * W, 1)
        return jnp.take_along_axis(flat, lin, axis=1).reshape(B, H, W, C)
    v00, v01, v10, v11 = g(y0i, x0i), g(y0i, x1i), g(y1i, x0i), g(y1i, x1i)
    fx = fx.astype(DT)[..., None]; fy = fy.astype(DT)[..., None]
    return jnp.mean((v00*(1-fx)+v01*fx)*(1-fy) + (v10*(1-fx)+v11*fx)*fy)


@jax.jit
def v2_horizontal_only(img, flow):
    # per-row gather along lanes: (B*H, W, C) take along axis 1
    fx, fy, x0i, y0i = coords(flow)
    x1i = jnp.minimum(x0i + 1, W - 1)
    rows = img.reshape(B * H, W, C)
    idx0 = x0i.reshape(B * H, W, 1)
    idx1 = x1i.reshape(B * H, W, 1)
    h0 = jnp.take_along_axis(rows, idx0, axis=1)
    h1 = jnp.take_along_axis(rows, idx1, axis=1)
    fx = fx.astype(DT).reshape(B * H, W, 1)
    return jnp.mean(h0 * (1 - fx) + h1 * fx)


@jax.jit
def v3_vertical_only(img, flow):
    # per-column gather along sublanes: (B, H, W*C) take along axis 1
    fx, fy, x0i, y0i = coords(flow)
    y1i = jnp.minimum(y0i + 1, H - 1)
    cols = img.reshape(B, H, W * C)
    # index per (b, out_h, w) -> expand to W*C by repeating over C
    idx0 = jnp.repeat(y0i, C, axis=-1).reshape(B, H, W * C)
    v0 = jnp.take_along_axis(cols, idx0, axis=1)
    fy = fy.astype(DT)[..., None]
    return jnp.mean(v0.reshape(B, H, W, C) * fy)


@jax.jit
def v4_planar_scalar(img, flow):
    # planar: (B*C, H*W) gather along last axis
    fx, fy, x0i, y0i = coords(flow)
    lin = (y0i * W + x0i).reshape(B, 1, H * W)
    planar = jnp.moveaxis(img, -1, 1).reshape(B, C, H * W)
    g = jnp.take_along_axis(planar, jnp.broadcast_to(lin, (B, C, H * W)), axis=2)
    return jnp.mean(g)


@jax.jit
def v5_onehot_vertical_matmul(img, flow):
    # vertical interpolation as per-column dense matmul (einsum) — exact
    # vertical pass only, to cost it. (i=out rows, y=in rows) per column j.
    fx, fy, x0i, y0i = coords(flow)
    onehot0 = jax.nn.one_hot(y0i, H, dtype=DT)  # (B, Hout, W, Hin)
    # out[b,i,j,c] = sum_y onehot[b,i,j,y] * img[b,y,j,c]
    out = jnp.einsum("bijy,byjc->bijc", onehot0, img)
    return jnp.mean(out)


bench("v1 flat (current)", v1_flat_rowsC, img, flow)
bench("v2 horizontal-only rows", v2_horizontal_only, img, flow)
bench("v3 vertical-only cols", v3_vertical_only, img, flow)
bench("v4 planar scalar", v4_planar_scalar, img, flow)
bench("v5 onehot vertical matmul", v5_onehot_vertical_matmul, img, flow)
