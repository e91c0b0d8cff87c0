"""Gaussian/Laplacian pyramid and the LapLoss training objective.

Reference: model/laplacian.py:10-59.  The 5x5 kernel [1,4,6,4,1]^T
[1,4,6,4,1]/256 is separable, so each blur is two 5-tap passes of shifted
slices under reflect padding.  Pyramid recursion: blur -> decimate by
stride-2 slicing -> zero-stuff upsample -> blur with 4x kernel ->
difference.  LapLoss is the sum of per-level L1 means over max_levels
levels (default 5, matching Model's training loss, model/RIFE.py:77-78).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_BINOMIAL5 = np.array([1.0, 4.0, 6.0, 4.0, 1.0], dtype=np.float32) / 16.0


def _reflect_pad(x: jnp.ndarray, axis: int, pad: int) -> jnp.ndarray:
    widths = [(0, 0)] * x.ndim
    widths[axis] = (pad, pad)
    return jnp.pad(x, widths, mode="reflect")


def _conv5(x: jnp.ndarray, axis: int, gain: float = 1.0) -> jnp.ndarray:
    taps = _BINOMIAL5 * gain
    x = _reflect_pad(x, axis, 2)
    out_len = x.shape[axis] - 4
    acc = None
    for i, t in enumerate(taps):
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(i, i + out_len)
        term = x[tuple(sl)] * jnp.asarray(t, dtype=x.dtype)
        acc = term if acc is None else acc + term
    return acc


def gauss_blur(x: jnp.ndarray, gain: float = 1.0) -> jnp.ndarray:
    """Separable 5x5 binomial blur on NHWC; gain multiplies the full 2-D kernel."""
    h_axis = x.ndim - 3
    # Split the 2-D gain across the two separable passes.
    g = float(np.sqrt(gain))
    x = _conv5(x, h_axis, g)
    x = _conv5(x, h_axis + 1, g)
    return x


def _decimate(x: jnp.ndarray) -> jnp.ndarray:
    h_axis = x.ndim - 3
    sl = [slice(None)] * x.ndim
    sl[h_axis] = slice(None, None, 2)
    sl[h_axis + 1] = slice(None, None, 2)
    return x[tuple(sl)]


def _zero_stuff_up(x: jnp.ndarray) -> jnp.ndarray:
    n, h, w, c = x.shape
    up = jnp.zeros((n, h, 2, w, 2, c), dtype=x.dtype)
    up = up.at[:, :, 0, :, 0, :].set(x)
    return up.reshape(n, 2 * h, 2 * w, c)


def laplacian_pyramid(img: jnp.ndarray, max_levels: int = 3) -> list[jnp.ndarray]:
    current = img
    pyr = []
    for _ in range(max_levels):
        filtered = gauss_blur(current)
        down = _decimate(filtered)
        up = gauss_blur(_zero_stuff_up(down), gain=4.0)
        pyr.append(current - up)
        current = down
    return pyr


def lap_loss(pred: jnp.ndarray, target: jnp.ndarray, max_levels: int = 5) -> jnp.ndarray:
    pyr_p = laplacian_pyramid(pred, max_levels)
    pyr_t = laplacian_pyramid(target, max_levels)
    return sum(jnp.mean(jnp.abs(a - b)) for a, b in zip(pyr_p, pyr_t))
