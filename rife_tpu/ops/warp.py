"""Backward bilinear warp (the RIFE sampling primitive).

Semantics contract (reference: model/warplayer.py:8-22): the reference
builds a normalized [-1, 1] grid, adds flow normalized by (size-1)/2 and
calls grid_sample(align_corners=True, padding_mode='border').  With
align_corners=True the normalized grid maps back to integer pixel centers,
so the whole dance is equivalent to sampling at

    (x + flow_x, y + flow_y)   in pixel coordinates, border-clamped.

We implement that directly: clamp the sample coordinate into
[0, size-1], split into floor corner + fraction, and blend four gathered
corners.  The gather uses a flattened spatial index so it lowers to a
single take_along_axis per corner; the iota grid is materialized by XLA,
no host-side grid cache is needed (unlike the reference's per-shape dict).

A Pallas row-tiled variant lives in rife_tpu.ops.pallas.warp for the hot
path; this module is the portable/golden implementation.
"""
from __future__ import annotations

import contextlib
import contextvars

import jax
import jax.numpy as jnp
from jax import lax

# Which implementation `warp` dispatches to at TRACE time:
#   "xla"    — exact gather path below (golden; differentiable)
#   "pallas" — rife_tpu.ops.pallas.warp tiled kernel (TPU fast path;
#              exact for locally-smooth flows, window-clamped otherwise)
_WARP_IMPL = contextvars.ContextVar("rife_tpu_warp_impl", default="xla")


def set_warp_impl(impl: str):
    assert impl in ("xla", "pallas"), impl
    _WARP_IMPL.set(impl)


@contextlib.contextmanager
def use_warp_impl(impl: str):
    token = _WARP_IMPL.set(impl)
    try:
        yield
    finally:
        _WARP_IMPL.reset(token)


def warp(img: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    if _WARP_IMPL.get() == "pallas":
        # Differentiable wrapper: Pallas forward, exact-XLA gradient —
        # inference traces only the primal; training gets a VJP.
        from rife_tpu.ops.pallas.warp import warp_pallas_diff

        return warp_pallas_diff(img, flow)
    return warp_xla(img, flow)


def warp2(img_a: jnp.ndarray, img_b: jnp.ndarray, flow_a: jnp.ndarray,
          flow_b: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Two warps fused into one kernel launch (every IFNet level warps an
    img0/img1 pair): batch-concat halves the per-call layout/prep work."""
    n = img_a.shape[0]
    both = warp(jnp.concatenate([img_a, img_b], 0),
                jnp.concatenate([flow_a, flow_b], 0))
    return both[:n], both[n:]


def to_planes(x: jnp.ndarray) -> jnp.ndarray:
    """NHWC -> NCHW.  The plane layout keeps (H, W) in the (8,128) tile,
    so full-resolution tensors with small C (images 3ch, flow 4ch, mask
    1ch) are lane-dense; in NHWC they waste up to 17x HBM bandwidth
    (measured, docs/PERFORMANCE.md 'layout tax')."""
    return jnp.moveaxis(x, -1, 1)


def from_planes(p: jnp.ndarray) -> jnp.ndarray:
    """NCHW -> NHWC (for conv stems and host I/O)."""
    return jnp.moveaxis(p, 1, -1)


def warp_planes(img_pl: jnp.ndarray, flow_pl: jnp.ndarray) -> jnp.ndarray:
    """Plane-layout warp: (N, C, H, W) x (N, 2, H, W) -> (N, C, H, W).

    Same dispatch contract as `warp`; the Pallas path skips the
    per-call NHWC<->NCHW relayouts entirely (the kernels are
    plane-native internally).

    The XLA path round-trips through the NHWC formulation instead of
    using warp_xla_planes: the results are bit-identical (same blend
    arithmetic per element), but NHWC gathers vectorize across C and
    their scatter-add transposes are the fast path on this XLA — the
    (N, C, H*W) per-channel gather/scatter lowering is pathological in
    the backward (measured 1.9 s/step vs 0.26 at the reference train
    config, tools/r3_exp12.py vs profile_trainstep2.py)."""
    if _WARP_IMPL.get() == "pallas":
        return warp_planes_pallas_diff(img_pl, flow_pl)
    return to_planes(warp_xla(from_planes(img_pl), from_planes(flow_pl)))


def warp2_planes(img_a: jnp.ndarray, img_b: jnp.ndarray, flow_a: jnp.ndarray,
                 flow_b: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Plane-layout warp2: one kernel launch for an img0/img1 pair."""
    n = img_a.shape[0]
    both = warp_planes(jnp.concatenate([img_a, img_b], 0),
                       jnp.concatenate([flow_a, flow_b], 0))
    return both[:n], both[n:]


# Default OFF: the fused epilogue failed its >2% full-graph adoption
# bar on the chip (r5 A/B, tools/r4_exp1_blendfuse.py: rife exact
# 58.19 ms fused vs 57.38 composed, fast 53.39 vs 53.13; v4.25 within
# +0.9% — docs/PERFORMANCE.md "Negative results").  The kernel stays as
# a recorded negative with its own unit tests; flip via use_fuse_blend.
_FUSE_BLEND = contextvars.ContextVar("rife_tpu_fuse_blend", default=False)


@contextlib.contextmanager
def use_fuse_blend(flag: bool):
    """A/B switch for the fused warp+blend epilogue (measurement
    harnesses and the fused-kernel tests)."""
    tok = _FUSE_BLEND.set(flag)
    try:
        yield
    finally:
        _FUSE_BLEND.reset(tok)


def _blend_composed(img_a, img_b, flow_pl, mask_pl):
    """Composed (differentiable) pair warp + blend, bf16 outputs to
    match the fused kernel's primal dtypes."""
    w0, w1 = warp2_planes(img_a, img_b, flow_pl[:, 0:2], flow_pl[:, 2:4])
    sig = jax.nn.sigmoid(mask_pl)
    blend = w0 * sig + w1 * (1 - sig)
    return (blend.astype(jnp.bfloat16), w0.astype(jnp.bfloat16),
            w1.astype(jnp.bfloat16))


@jax.custom_vjp
def _warp_blend_pair_fused(img_a, img_b, flow_pl, mask_pl):
    from rife_tpu.ops.pallas.warp_blend import warp_pair_blend_pl

    return warp_pair_blend_pl(img_a, img_b, flow_pl, mask_pl,
                              emit_pair=True)


def _wbp_fwd(img_a, img_b, flow_pl, mask_pl):
    return (_warp_blend_pair_fused(img_a, img_b, flow_pl, mask_pl),
            (img_a, img_b, flow_pl, mask_pl))


def _wbp_bwd(res, g):
    # Backward through the composed formulation (warp2_planes carries
    # the Pallas kernel-grad VJP) — the fused kernel stays primal-only.
    return jax.vjp(_blend_composed, *res)[1](g)


_warp_blend_pair_fused.defvjp(_wbp_fwd, _wbp_bwd)


@jax.custom_vjp
def _warp_blend_only_fused(img_a, img_b, flow_pl, mask_pl):
    from rife_tpu.ops.pallas.warp_blend import warp_pair_blend_pl

    return warp_pair_blend_pl(img_a, img_b, flow_pl, mask_pl,
                              emit_pair=False)


def _wbo_fwd(img_a, img_b, flow_pl, mask_pl):
    return (_warp_blend_only_fused(img_a, img_b, flow_pl, mask_pl),
            (img_a, img_b, flow_pl, mask_pl))


def _wbo_bwd(res, g):
    return jax.vjp(lambda *a: _blend_composed(*a)[0], *res)[1](g)


_warp_blend_only_fused.defvjp(_wbo_fwd, _wbo_bwd)


def warp2_blend_planes(img_a: jnp.ndarray, img_b: jnp.ndarray,
                       flow_pl: jnp.ndarray, mask_pl: jnp.ndarray,
                       need_pair: bool = True):
    """Final-level pair warp fused with the sigmoid-mask blend
    (reference model/IFNet.py:82,99).

    flow_pl: (N, 4, H, W) both directions; mask_pl: (N, 1, H, W)
    PRE-sigmoid.  Returns (blend, w0, w1) when need_pair (the paper
    model's U-Net consumes the warps too) else just blend.

    Pallas impl: one program warps both images of the pair and emits
    the blend from the output stage (ops/pallas/warp_blend.py) — w0/w1
    are bit-exact vs warp2_planes, the blend is within one bf16 ulp of
    the composed blend (single f32 rounding instead of bf16 products).
    Differentiation routes through the composed ops (kernel-grad warp
    VJP); the fused kernel is primal-only.  XLA impl composes the
    exact ops unchanged.  `_FUSE_BLEND` (contextvar, default OFF — the
    fusion lost its full-graph A/B, see docs/PERFORMANCE.md) selects
    the fused kernel; `use_fuse_blend(True)` flips it."""
    if _WARP_IMPL.get() == "pallas" and _FUSE_BLEND.get():
        if need_pair:
            blend, w0, w1 = _warp_blend_pair_fused(img_a, img_b, flow_pl,
                                                   mask_pl)
            return (blend.astype(img_a.dtype), w0.astype(img_a.dtype),
                    w1.astype(img_a.dtype))
        out = _warp_blend_only_fused(img_a, img_b, flow_pl, mask_pl)
        return out.astype(img_a.dtype)
    w0, w1 = warp2_planes(img_a, img_b, flow_pl[:, 0:2], flow_pl[:, 2:4])
    sig = jax.nn.sigmoid(mask_pl)
    blend = w0 * sig + w1 * (1 - sig)
    return (blend, w0, w1) if need_pair else blend


def warp_xla_planes(img_pl: jnp.ndarray, flow_pl: jnp.ndarray) -> jnp.ndarray:
    """Exact gather warp on the plane layout (golden / CPU / VJP path).

    img_pl:  (N, C, H, W);  flow_pl: (N, 2, H, W) pixel units
    ([:, 0] = dx, [:, 1] = dy), border-clamped bilinear sampling —
    identical semantics to `warp_xla` modulo layout."""
    n, c, h, w = img_pl.shape
    dtype = img_pl.dtype
    xs = lax.broadcasted_iota(jnp.float32, (h, w), 1)
    ys = lax.broadcasted_iota(jnp.float32, (h, w), 0)
    ix = jnp.clip(xs[None] + flow_pl[:, 0].astype(jnp.float32), 0.0, w - 1)
    iy = jnp.clip(ys[None] + flow_pl[:, 1].astype(jnp.float32), 0.0, h - 1)

    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    fx = (ix - x0).astype(dtype)[:, None]
    fy = (iy - y0).astype(dtype)[:, None]

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, w - 1)
    y1i = jnp.minimum(y0i + 1, h - 1)

    flat = img_pl.reshape(n, c, h * w)

    def gather(yi, xi):
        lin = (yi * w + xi).reshape(n, 1, h * w)
        lin = jnp.broadcast_to(lin, (n, c, h * w))
        return jnp.take_along_axis(flat, lin, axis=2).reshape(n, c, h, w)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x1i)
    v10 = gather(y1i, x0i)
    v11 = gather(y1i, x1i)

    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy


def _planes_pallas(img_pl, flow_pl):
    from rife_tpu.ops.pallas.warp_v5 import warp_pallas_v5_pl

    return warp_pallas_v5_pl(img_pl, flow_pl).astype(img_pl.dtype)


def _planes_diff_fwd(img_pl, flow_pl):
    from rife_tpu.ops.pallas.warp_v5 import warp_pallas_v5_pl

    # One kernel pass also emits dI/dx, dI/dy (the derivatives of the
    # warped value w.r.t. the sampling coordinate), so the backward
    # never re-gathers: XLA's per-pixel gather costs ~8x the kernel
    # (209 vs 26 ms fwd+loss at the reference train config,
    # tools/r3_exp12/15.py) and the old exact-XLA VJP re-ran it once
    # more inside the backward for d/flow's corner taps.
    out, didx, didy = warp_pallas_v5_pl(img_pl, flow_pl, emit_grads=True)
    return out.astype(img_pl.dtype), (img_pl, flow_pl, didx, didy)


def _planes_diff_bwd(res, g):
    img_pl, flow_pl, didx, didy = res
    n, c, h, w = img_pl.shape
    gf = g.astype(jnp.float32)

    # d/flow: reduce g * dI/d(coord) over channels; zero where the
    # sampling coordinate was border-clamped (the gradient of clip).
    dfx = jnp.sum(gf * didx.astype(jnp.float32), axis=1)
    dfy = jnp.sum(gf * didy.astype(jnp.float32), axis=1)
    xs = lax.broadcasted_iota(jnp.float32, (h, w), 1)
    ys = lax.broadcasted_iota(jnp.float32, (h, w), 0)
    rawx = xs[None] + flow_pl[:, 0].astype(jnp.float32)
    rawy = ys[None] + flow_pl[:, 1].astype(jnp.float32)
    inx = jnp.logical_and(rawx > 0.0, rawx < w - 1).astype(jnp.float32)
    iny = jnp.logical_and(rawy > 0.0, rawy < h - 1).astype(jnp.float32)
    d_flow = jnp.stack([dfx * inx, dfy * iny], 1).astype(flow_pl.dtype)

    # d/img: the adjoint of the 4-corner gather-blend with the flow
    # STOPPED — XLA emits only the scatter-adds (the unused primal
    # gathers are DCE'd), in the NHWC formulation (plane-layout
    # scatters are pathological, see warp_planes docstring).
    def lin(i_pl):
        return to_planes(warp_xla(from_planes(i_pl),
                                  lax.stop_gradient(from_planes(flow_pl))))

    _, vjp = jax.vjp(lin, img_pl)
    d_img = vjp(g.astype(img_pl.dtype))[0]
    return d_img, d_flow


@jax.custom_vjp
def warp_planes_pallas_diff(img_pl: jnp.ndarray,
                            flow_pl: jnp.ndarray) -> jnp.ndarray:
    """Pallas plane warp with gradients: v5 plane kernel forward with
    in-kernel coordinate derivatives, scatter-only exact d/img.

    Gradient contract: d/img is the exact adjoint of the XLA warp;
    d/flow is computed from bf16 taps under the v5 window contract
    (matches the forward's own precision) and is zeroed at
    border-clamped samples like the exact path."""
    return _planes_pallas(img_pl, flow_pl)


warp_planes_pallas_diff.defvjp(_planes_diff_fwd, _planes_diff_bwd)


def warp_xla(img: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Backward-warp img by flow.

    Args:
      img:  (N, H, W, C) source image/features.
      flow: (N, H, W, 2) pixel-unit flow; [..., 0] = dx, [..., 1] = dy.

    Returns:
      (N, H, W, C) img sampled at (x+dx, y+dy), bilinear, border clamp.
    """
    n, h, w, c = img.shape
    dtype = img.dtype
    # Compute sampling coordinates in f32: flow magnitudes are small but
    # pixel indices are not, and bf16 cannot address >256px exactly.
    xs = lax.broadcasted_iota(jnp.float32, (h, w), 1)
    ys = lax.broadcasted_iota(jnp.float32, (h, w), 0)
    ix = jnp.clip(xs[None] + flow[..., 0].astype(jnp.float32), 0.0, w - 1)
    iy = jnp.clip(ys[None] + flow[..., 1].astype(jnp.float32), 0.0, h - 1)

    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    fx = (ix - x0).astype(dtype)[..., None]
    fy = (iy - y0).astype(dtype)[..., None]

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, w - 1)
    y1i = jnp.minimum(y0i + 1, h - 1)

    flat = img.reshape(n, h * w, c)

    def gather(yi, xi):
        lin = (yi * w + xi).reshape(n, h * w, 1)
        return jnp.take_along_axis(flat, lin, axis=1).reshape(n, h, w, c)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x1i)
    v10 = gather(y1i, x0i)
    v11 = gather(y1i, x1i)

    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy
