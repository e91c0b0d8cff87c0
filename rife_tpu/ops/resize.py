"""Bilinear resize with exact half-pixel (align_corners=False) semantics.

The RIFE coarse-to-fine pyramid is resolution-invariant only because every
level downsamples its input and rescales the flow with one precise
coordinate convention (reference: model/IFNet.py:40-49,
F.interpolate(..., align_corners=False)).  Off-by-half-pixel errors here
directly corrupt the estimated flow, so we implement the convention
explicitly instead of relying on a library resize:

    src = (dst + 0.5) * (in / out) - 0.5,  clamped below at 0
    i0 = floor(src), i1 = min(i0 + 1, in - 1), lam = src - i0

All index/weight tables are computed at trace time with numpy from the
static shapes, so under jit the op lowers to two static gathers and a lerp
per axis — XLA fuses the pair into the surrounding elementwise work.  For
the ubiquitous x0.5 case the formula degenerates to exact 2x2 mean pooling
which we special-case (pure reshape+mean, no gather at all).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _lerp_table(in_size: int, out_size: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    src = (np.arange(out_size, dtype=np.float64) + 0.5) * (in_size / out_size) - 0.5
    src = np.maximum(src, 0.0)
    i0 = np.minimum(np.floor(src).astype(np.int32), in_size - 1)
    i1 = np.minimum(i0 + 1, in_size - 1)
    lam = (src - i0).astype(np.float32)
    return i0, i1, lam


def _resize_axis(x: jnp.ndarray, out_size: int, axis: int) -> jnp.ndarray:
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    i0, i1, lam = _lerp_table(in_size, out_size)
    lam_shape = [1] * x.ndim
    lam_shape[axis] = out_size
    lam_b = jnp.asarray(lam, dtype=x.dtype).reshape(lam_shape)
    x0 = jnp.take(x, jnp.asarray(i0), axis=axis)
    x1 = jnp.take(x, jnp.asarray(i1), axis=axis)
    return x0 * (1 - lam_b) + x1 * lam_b


def _is_half(in_size: int, out_size: int) -> bool:
    return in_size == out_size * 2


@jax.custom_vjp
def _half_downsample(x: jnp.ndarray) -> jnp.ndarray:
    """Exact 2x2 mean pooling on NHWC: fold the lane-pair reduction into
    a channel-half add via a free reshape, then add the row pair.

    Measured on 17ch 720p b4 (tools/profile_resize2.py): this w-fold +
    h-index form 1.76 ms vs reduce_window 2.27 ms, 6-d reshape+mean
    12 ms, strided slices 93 ms.  The custom VJP (broadcast g/4 to the
    2x2 block) is kept — it is cheaper than autodiffing the slicing.
    """
    n, h, w, c = x.shape
    a = x.reshape(n, h, w // 2, 2 * c)
    a = a[..., :c] + a[..., c:]
    a = a.reshape(n, h // 2, 2, w // 2, c)
    a = a[:, :, 0] + a[:, :, 1]
    return a * jnp.asarray(0.25, x.dtype)


def _half_downsample_fwd(x):
    return _half_downsample(x), None


def _half_downsample_bwd(_, g):
    g4 = g * jnp.asarray(0.25, g.dtype)
    n, h, w, c = g4.shape
    gi = jnp.broadcast_to(g4[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return (gi.reshape(n, h * 2, w * 2, c),)


_half_downsample.defvjp(_half_downsample_fwd, _half_downsample_bwd)


def resize_bilinear(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Resize NHWC (or HWC) image to (H_out, W_out), torch-interpolate exact."""
    h_axis = x.ndim - 3
    w_axis = x.ndim - 2
    out_h, out_w = out_hw
    in_h, in_w = x.shape[h_axis], x.shape[w_axis]
    if x.ndim == 4 and _is_half(in_h, out_h) and _is_half(in_w, out_w):
        # (dst+0.5)*2-0.5 = 2*dst+0.5 => mean of the 2x2 block: exact.
        return _half_downsample(x)
    x = _resize_axis(x, out_h, h_axis)
    x = _resize_axis(x, out_w, w_axis)
    return x


def plane_up(p: jnp.ndarray, f: int) -> jnp.ndarray:
    """Integer-factor bilinear upsample on (N, C, H, W) planes, exact
    torch-interpolate (align_corners=False) semantics.

    Phase decomposition: for integer f each of the f output phases along
    an axis is a *fixed* 2-tap lerp of the input, so the resize becomes
    f shifted weighted sums interleaved by a minor-merge reshape — all
    dense-lane work, no gathers (the gather-lerp NHWC path pays the
    small-C layout tax; see docs/PERFORMANCE.md).  Validated exact vs
    resize_bilinear for f in {2,4,8} (tools/r3_exp8.py)."""
    if f == 1:
        return p
    for axis in (2, 3):
        size = p.shape[axis]
        srcs = (np.arange(f) + 0.5) / f - 0.5
        i0 = np.floor(srcs).astype(int)        # -1 or 0
        lam = (srcs - i0).astype(np.float32)
        lo = jnp.concatenate([jax.lax.slice_in_dim(p, 0, 1, axis=axis),
                              jax.lax.slice_in_dim(p, 0, size - 1, axis=axis)],
                             axis)
        hi = jnp.concatenate([jax.lax.slice_in_dim(p, 1, size, axis=axis),
                              jax.lax.slice_in_dim(p, size - 1, size, axis=axis)],
                             axis)
        phases = []
        for q in range(f):
            a, b = (lo, p) if i0[q] < 0 else (p, hi)
            wl = jnp.asarray(1.0 - lam[q], p.dtype)
            phases.append(a * wl + b * (1 - wl))
        st = jnp.stack(phases, axis + 1)       # (..., size, f, ...)
        p = st.reshape(p.shape[:axis] + (size * f,) + p.shape[axis + 1:])
    return p


def plane_down_int(p: jnp.ndarray, f: int) -> jnp.ndarray:
    """Exact even-integer-factor bilinear downsample on (N, C, H, W)
    planes: torch F.interpolate(scale_factor=1/f, align_corners=False)
    samples src = f*i + f/2 - 0.5, i.e. each axis is the mean of
    elements f*i + f/2 - 1 and f*i + f/2 — a separable fixed 2-tap,
    expressed with split reshapes + static slices (dense-lane work, no
    gathers).  f == 2 coincides with plane_down2's 2x2 mean."""
    if f == 1:
        return p
    assert f % 2 == 0, f
    # f == 2 deliberately does NOT dispatch to plane_down2: the
    # reduce_window lowering measured 3.3 ms/iter SLOWER than this
    # split-reshape form on the v4.25 fast graph (tools/r3_exp48).
    n, c, h, w = p.shape
    half = jnp.asarray(0.5, p.dtype)
    x = p.reshape(n, c, h // f, f, w)
    x = (x[:, :, :, f // 2 - 1] + x[:, :, :, f // 2]) * half
    x = x.reshape(n, c, h // f, w // f, f)
    return (x[..., f // 2 - 1] + x[..., f // 2]) * half


@jax.custom_vjp
def plane_down2(p: jnp.ndarray) -> jnp.ndarray:
    """Exact 2x2 mean pooling on (N, C, H, W) planes (the x0.5 bilinear
    case) via a dense reduce_window."""
    s = jax.lax.reduce_window(
        p, jnp.zeros((), p.dtype), jax.lax.add,
        window_dimensions=(1, 1, 2, 2), window_strides=(1, 1, 2, 2),
        padding="VALID")
    return s * jnp.asarray(0.25, p.dtype)


def _plane_down2_fwd(p):
    return plane_down2(p), None


def _plane_down2_bwd(_, g):
    g4 = g * jnp.asarray(0.25, g.dtype)
    n, c, h, w = g4.shape
    gi = jnp.broadcast_to(g4[:, :, :, None, :, None], (n, c, h, 2, w, 2))
    return (gi.reshape(n, c, h * 2, w * 2),)


plane_down2.defvjp(_plane_down2_fwd, _plane_down2_bwd)


def scale_by(x: jnp.ndarray, factor: float) -> jnp.ndarray:
    """Resize by a scale factor (output size = floor(in * factor))."""
    h_axis = x.ndim - 3
    w_axis = x.ndim - 2
    out_h = int(np.floor(x.shape[h_axis] * factor))
    out_w = int(np.floor(x.shape[w_axis] * factor))
    return resize_bilinear(x, (out_h, out_w))
