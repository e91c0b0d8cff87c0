"""Parameter initialization matching torch defaults.

Training-from-scratch parity requires the same init distribution the
reference gets implicitly from torch: Conv2d/ConvTranspose2d use
kaiming_uniform(a=sqrt(5)) => U(-sqrt(1/fan_in), sqrt(1/fan_in)) for
weights and U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for biases; PReLU slopes
start at 0.25.

Note torch computes fan_in from the raw weight tensor, so for
ConvTranspose2d (weight (in, out, kh, kw)) fan_in = out * kh * kw — we
reproduce that quirk.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _uniform(key, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def init_conv(key, kh: int, kw: int, cin: int, cout: int, dtype=jnp.float32) -> dict:
    kw_, kb_ = jax.random.split(key)
    fan_in = cin * kh * kw
    return {
        "w": _uniform(kw_, (kh, kw, cin, cout), math.sqrt(1.0 / fan_in), dtype),
        "b": _uniform(kb_, (cout,), 1.0 / math.sqrt(fan_in), dtype),
    }


def init_conv_transpose(key, k: int, cin: int, cout: int, dtype=jnp.float32) -> dict:
    kw_, kb_ = jax.random.split(key)
    fan_in = cout * k * k  # torch fan-in quirk for transposed conv
    return {
        "w": _uniform(kw_, (k, k, cin, cout), math.sqrt(1.0 / fan_in), dtype),
        "b": _uniform(kb_, (cout,), 1.0 / math.sqrt(fan_in), dtype),
    }


def init_prelu(cout: int, dtype=jnp.float32) -> jnp.ndarray:
    return jnp.full((cout,), 0.25, dtype)


def conv_prelu_params(key, kh: int, kw: int, cin: int, cout: int, dtype=jnp.float32) -> dict:
    return {"conv": init_conv(key, kh, kw, cin, cout, dtype), "alpha": init_prelu(cout, dtype)}


def deconv_prelu_params(key, k: int, cin: int, cout: int, dtype=jnp.float32) -> dict:
    return {"conv": init_conv_transpose(key, k, cin, cout, dtype), "alpha": init_prelu(cout, dtype)}
