"""Functional NHWC conv/activation primitives.

Params are plain pytrees (nested dicts of jnp arrays) — no module
framework.  Conventions:

- conv weights are HWIO; biases are (O,).
- transposed-conv weights are stored *pre-converted* to the equivalent
  forward conv (spatially flipped, HWIO with I = the transpose-conv's
  input channels), so at runtime a ConvTranspose is just an
  input-dilated conv_general_dilated.  The torch-state-dict importer and
  the initializers both produce this form.
- compute dtype follows the input.  The MXU accumulates bf16 convs in
  f32 internally; the conv OUTPUT dtype matches the input (an explicit
  f32 preferred_element_type on bf16 operands breaks this JAX version's
  conv VJP with a dtype mismatch, and buys nothing since the result is
  immediately cast back to the compute dtype anyway).

These are the building blocks for IFBlock/Contextnet/Unet
(reference: model/IFNet.py:7-18, model/refine.py:11-22).
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from rife_tpu.nn import tiled as _tiled

_DIMNUMS = ("NHWC", "HWIO", "NHWC")

# Precision policy: JAX's default conv/matmul precision silently truncates
# f32 operands to bf16 on TPU (and mirrors that on CPU), so f32 paths pin
# HIGHEST.  bf16 inputs use DEFAULT — they are already bf16-exact, and
# HIGHEST would force a slow multi-pass f32 algorithm on the MXU
# (measured ~150x off peak).  MXU accumulation is f32 either way.
def _precision_for(dtype):
    return lax.Precision.HIGHEST if dtype == jnp.float32 else lax.Precision.DEFAULT


# H-tiling dispatch for large-spatial convs (see rife_tpu.nn.tiled).
# None = auto (tile on TPU only); True/False force for tests/benchmarks.
_TILING_OVERRIDE: bool | None = None

# Tile-assembly layout for the 3x3 tiled convs: "batch" folds tiles into
# the batch dim (the adopted form), "hstack" stacks them along H — the
# r5 layout-copy candidate, measured 56% SLOWER full-graph (89.8 vs
# 57.6 ms/iter, tools/r5_exp5_hstack.py); kept only as the recorded
# negative's harness hook (docs/PERFORMANCE.md round-5 negatives).
_TILED_CONV_IMPL = "batch"


def set_tiled_conv_impl(name: str) -> None:
    assert name in ("batch", "hstack"), name
    global _TILED_CONV_IMPL
    _TILED_CONV_IMPL = name


def _tiling_on() -> bool:
    if _TILING_OVERRIDE is not None:
        return _TILING_OVERRIDE
    import jax

    return jax.default_backend() == "tpu"


class use_conv_tiling:
    """Context manager forcing the tiled-conv rewrite on or off."""

    def __init__(self, enabled: bool | None):
        self.enabled = enabled

    def __enter__(self):
        global _TILING_OVERRIDE
        self._prev = _TILING_OVERRIDE
        _TILING_OVERRIDE = self.enabled

    def __exit__(self, *a):
        global _TILING_OVERRIDE
        _TILING_OVERRIDE = self._prev


def conv2d(x: jnp.ndarray, p: dict, stride: int = 1, padding: int | None = None,
           dilation: int = 1) -> jnp.ndarray:
    """3x3-style conv with torch Conv2d(padding=p) semantics."""
    w = p["w"].astype(x.dtype)
    kh, kw = w.shape[0], w.shape[1]
    if padding is None:
        padding = (kh - 1) // 2 * dilation
    if (kh == 3 and kw == 3 and dilation == 1 and padding == 1
            and stride in (1, 2) and x.ndim == 4
            and x.shape[1] * x.shape[2] >= _tiled.MIN_PIXELS
            and x.shape[1] % stride == 0 and _tiling_on()):
        impl = (_tiled.conv2d_tiled_hstack if _TILED_CONV_IMPL == "hstack"
                else _tiled.conv2d_tiled)
        out = impl(x, w, stride, _precision_for(x.dtype))
    else:
        out = lax.conv_general_dilated(
            x, w,
            window_strides=(stride, stride),
            padding=((padding, padding), (padding, padding)),
            rhs_dilation=(dilation, dilation),
            dimension_numbers=_DIMNUMS,
            precision=_precision_for(x.dtype),
            preferred_element_type=x.dtype,
        ).astype(x.dtype)
    if "b" in p:
        out = out + p["b"].astype(x.dtype)
    return out


def conv2d_planes(x_pl: jnp.ndarray, p: dict, stride: int = 1) -> jnp.ndarray:
    """Conv consuming (N, C, H, W) planes; output plain NHWC.

    Exactly from_planes + conv2d.  Entry point for the plane-major
    glue: block stems, U-Net down0 and contextnet conv1 consume
    full-resolution plane concats (models/ifnet.py, models/refine.py).
    A variant that assembled the H-tiled halos in the dense plane
    layout (one relayout instead of relayout + lane-sparse halo concat)
    measured SLOWER full-graph — 63.0 ms/iter take-assembly / 60.1
    concat-assembly vs 57.3 (tools/r3_exp37_planesconv.py) — so this
    stays the plain lowering; see docs/PERFORMANCE.md negatives."""
    return conv2d(jnp.moveaxis(x_pl, 1, -1), p, stride=stride)


def conv_prelu_planes(x_pl: jnp.ndarray, p: dict, stride: int = 1) -> jnp.ndarray:
    """conv() block consuming planes: Conv2d + PReLU, NHWC out."""
    return prelu(conv2d_planes(x_pl, p["conv"], stride=stride), p["alpha"])


def conv_transpose2d(x: jnp.ndarray, p: dict, stride: int = 2,
                     torch_padding: int = 1) -> jnp.ndarray:
    """torch ConvTranspose2d(k, stride, padding) with pre-flipped weights.

    (A phase-decomposed 2x2-conv rewrite and a space-to-depth stride-2
    rewrite were measured slower than the dilated/native forms on the
    current TPU compiler — relayouts dominate; see docs/PERFORMANCE.md
    "Measured negative results" and git history for the code.)
    """
    w = p["w"].astype(x.dtype)  # (kh, kw, I, O), already spatially flipped
    k = w.shape[0]
    pad = k - 1 - torch_padding
    if (k == 4 and stride == 2 and torch_padding == 1 and x.ndim == 4
            and x.shape[1] * x.shape[2] >= _tiled.MIN_PIXELS and _tiling_on()):
        out = _tiled.conv_transpose2d_tiled(x, w, _precision_for(x.dtype))
    else:
        out = lax.conv_general_dilated(
            x, w,
            window_strides=(1, 1),
            padding=((pad, pad), (pad, pad)),
            lhs_dilation=(stride, stride),
            dimension_numbers=_DIMNUMS,
            precision=_precision_for(x.dtype),
            preferred_element_type=x.dtype,
        ).astype(x.dtype)
    if "b" in p:
        out = out + p["b"].astype(x.dtype)
    return out


def prelu(x: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """Per-channel PReLU; alpha shape (C,) broadcasting over NHWC."""
    a = alpha.astype(x.dtype)
    return jnp.where(x >= 0, x, a * x)


def leaky_relu(x: jnp.ndarray, negative_slope: float = 0.2) -> jnp.ndarray:
    return jnp.where(x >= 0, x, x * jnp.asarray(negative_slope, x.dtype))


def conv_prelu(x: jnp.ndarray, p: dict, stride: int = 1, dilation: int = 1) -> jnp.ndarray:
    """conv() block of the reference: Conv2d + PReLU (model/IFNet.py:13-18)."""
    return prelu(conv2d(x, p["conv"], stride=stride, dilation=dilation), p["alpha"])


def pixel_shuffle(x: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    """torch PixelShuffle on NHWC with torch channel ordering.

    Input channel index c_t maps as c_t = c * r^2 + dh * r + dw, so that a
    torch-imported ConvTranspose -> PixelShuffle head (v4.25 lastconv,
    train_log/IFNet_HDv3.py:73-76) is layout-compatible.
    """
    n, h, w, c = x.shape
    assert c % (r * r) == 0
    co = c // (r * r)
    y = x.reshape(n, h, w, co, r, r)
    y = y.transpose(0, 1, 4, 2, 5, 3)
    return y.reshape(n, h * r, w * r, co)
