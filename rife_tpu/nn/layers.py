"""Functional NHWC conv/activation primitives.

Params are plain pytrees (nested dicts of jnp arrays) — no module
framework.  Conventions:

- conv weights are HWIO; biases are (O,).
- transposed-conv weights are stored *pre-converted* to the equivalent
  forward conv (spatially flipped, HWIO with I = the transpose-conv's
  input channels), so at runtime a ConvTranspose is just an
  input-dilated conv_general_dilated.  The torch-state-dict importer and
  the initializers both produce this form.
- compute dtype follows the input; accumulation is forced to f32 via
  preferred_element_type so bf16 activations keep MXU-f32 accuracy.

These are the building blocks for IFBlock/Contextnet/Unet
(reference: model/IFNet.py:7-18, model/refine.py:11-22).
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax

_DIMNUMS = ("NHWC", "HWIO", "NHWC")

# Explicit HIGHEST precision: JAX's default conv/matmul precision silently
# truncates f32 operands to bf16 on TPU (and mirrors that on CPU).  Our
# performance path opts into bf16 by casting activations/weights, so
# HIGHEST here only guarantees that f32 paths really are f32.
_PRECISION = lax.Precision.HIGHEST


def conv2d(x: jnp.ndarray, p: dict, stride: int = 1, padding: int | None = None,
           dilation: int = 1) -> jnp.ndarray:
    """3x3-style conv with torch Conv2d(padding=p) semantics."""
    w = p["w"].astype(x.dtype)
    kh, kw = w.shape[0], w.shape[1]
    if padding is None:
        padding = (kh - 1) // 2 * dilation
    out = lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=_DIMNUMS,
        precision=_PRECISION,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if "b" in p:
        out = out + p["b"].astype(x.dtype)
    return out


def conv_transpose2d(x: jnp.ndarray, p: dict, stride: int = 2,
                     torch_padding: int = 1) -> jnp.ndarray:
    """torch ConvTranspose2d(k, stride, padding) with pre-flipped weights.

    Implemented as lhs-dilated conv: dilate input by stride, pad each side
    by (k - 1 - torch_padding), run a normal conv with the stored
    (already flipped) kernel.
    """
    w = p["w"].astype(x.dtype)
    k = w.shape[0]
    pad = k - 1 - torch_padding
    out = lax.conv_general_dilated(
        x, w,
        window_strides=(1, 1),
        padding=((pad, pad), (pad, pad)),
        lhs_dilation=(stride, stride),
        dimension_numbers=_DIMNUMS,
        precision=_PRECISION,
        preferred_element_type=jnp.float32,
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
