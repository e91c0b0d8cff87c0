"""Padding utilities for shape-bucketed jit compilation.

Two conventions exist in the reference and both are part of the API
contract:

- CLI padding: zero-pad right/bottom to a multiple of `mult`
  (reference: inference_img.py:62-67, inference_video.py:199-202, where
  mult = max(32, 32/scale)).
- App padding: centered padding to max(min_size, ceil-to-multiple), used
  by the service layer (reference: rife_app/utils/framing.py:216-253).

Both return the crop window so callers can recover the original frame.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp


@dataclass(frozen=True)
class Padding:
    top: int
    bottom: int
    left: int
    right: int
    orig_h: int
    orig_w: int

    @property
    def padded_h(self) -> int:
        return self.orig_h + self.top + self.bottom

    @property
    def padded_w(self) -> int:
        return self.orig_w + self.left + self.right

    def crop(self, x: jnp.ndarray) -> jnp.ndarray:
        """Crop an NHWC (or HWC) array back to the original frame."""
        h_axis = x.ndim - 3
        sl = [slice(None)] * x.ndim
        sl[h_axis] = slice(self.top, self.top + self.orig_h)
        sl[h_axis + 1] = slice(self.left, self.left + self.orig_w)
        return x[tuple(sl)]


def _ceil_to(v: int, mult: int) -> int:
    return ((v - 1) // mult + 1) * mult


def plan_pad_to_multiple(h: int, w: int, mult: int = 32) -> Padding:
    """Right/bottom zero-padding plan to a multiple of mult (CLI contract)."""
    return Padding(0, _ceil_to(h, mult) - h, 0, _ceil_to(w, mult) - w, h, w)


def plan_pad_centered(h: int, w: int, mult: int = 32, min_size: int = 512) -> Padding:
    """Centered padding plan to >= min_size and a multiple of mult (app contract)."""
    th = max(min_size, _ceil_to(h, mult))
    tw = max(min_size, _ceil_to(w, mult))
    ph, pw = th - h, tw - w
    return Padding(ph // 2, ph - ph // 2, pw // 2, pw - pw // 2, h, w)


def _apply(x: jnp.ndarray, p: Padding) -> jnp.ndarray:
    h_axis = x.ndim - 3
    widths = [(0, 0)] * x.ndim
    widths[h_axis] = (p.top, p.bottom)
    widths[h_axis + 1] = (p.left, p.right)
    return jnp.pad(x, widths)


def pad_to_multiple(x: jnp.ndarray, mult: int = 32) -> tuple[jnp.ndarray, Padding]:
    h_axis = x.ndim - 3
    p = plan_pad_to_multiple(x.shape[h_axis], x.shape[h_axis + 1], mult)
    return _apply(x, p), p


def pad_centered(x: jnp.ndarray, mult: int = 32, min_size: int = 512) -> tuple[jnp.ndarray, Padding]:
    h_axis = x.ndim - 3
    p = plan_pad_centered(x.shape[h_axis], x.shape[h_axis + 1], mult, min_size)
    return _apply(x, p), p
