"""Exactness of the H-tiled conv rewrite (rife_tpu.nn.tiled).

The rewrite must be bit-exact vs the plain lowering: it dispatches
automatically on TPU for large-spatial convs, so any drift would leak
into model parity.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rife_tpu.nn import layers
from rife_tpu.nn.tiled import (conv2d_tiled, conv2d_tiled_hstack,
                               conv_transpose2d_tiled)


@pytest.mark.parametrize("impl", [conv2d_tiled, conv2d_tiled_hstack])
@pytest.mark.parametrize("stride", [1, 2])
@pytest.mark.parametrize("shape", [(2, 64, 96, 17), (1, 96, 64, 5), (2, 50, 64, 8)])
def test_conv2d_tiled_exact(rng, impl, stride, shape):
    if shape[1] % stride:
        pytest.skip("H not divisible by stride")
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, shape[-1], 13)), jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, w, (stride, stride), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    got = impl(x, w, stride, jax.lax.Precision.HIGHEST, T=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_conv2d_planes_dispatch(rng):
    """layers.conv2d_planes == from_planes + conv2d, tiled or not."""
    x = jnp.asarray(rng.standard_normal((1, 512, 512, 17)), jnp.float32)
    x_pl = jnp.moveaxis(x, -1, 1)
    p = {"w": jnp.asarray(rng.standard_normal((3, 3, 17, 6)), jnp.float32) * 0.1,
         "b": jnp.asarray(rng.standard_normal((6,)), jnp.float32)}
    for stride in (1, 2):
        with layers.use_conv_tiling(False):
            a = layers.conv2d(x, p, stride=stride)
        with layers.use_conv_tiling(True):
            b = layers.conv2d_planes(x_pl, p, stride=stride)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_conv_transpose2d_tiled_exact(rng):
    x = jnp.asarray(rng.standard_normal((2, 48, 64, 9)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((4, 4, 9, 7)), jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((2, 2), (2, 2)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    got = conv_transpose2d_tiled(x, w, jax.lax.Precision.HIGHEST, T=8)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_dispatch_roundtrip_through_layers(rng):
    """conv2d/conv_transpose2d produce identical results tiled vs not."""
    x = jnp.asarray(rng.standard_normal((1, 512, 512, 17)), jnp.float32)
    p = {"w": jnp.asarray(rng.standard_normal((3, 3, 17, 6)), jnp.float32) * 0.1,
         "b": jnp.asarray(rng.standard_normal((6,)), jnp.float32)}
    with layers.use_conv_tiling(False):
        a = layers.conv2d(x, p, stride=2)
    with layers.use_conv_tiling(True):
        b = layers.conv2d(x, p, stride=2)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    xd = jnp.asarray(rng.standard_normal((1, 512, 512, 6)), jnp.float32)
    pd = {"w": jnp.asarray(rng.standard_normal((4, 4, 6, 4)), jnp.float32) * 0.1}
    with layers.use_conv_tiling(False):
        a = layers.conv_transpose2d(xd, pd)
    with layers.use_conv_tiling(True):
        b = layers.conv_transpose2d(xd, pd)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
