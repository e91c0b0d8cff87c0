"""Pallas warp kernel vs the exact XLA warp (interpret mode on CPU).

The kernel contract (rife_tpu/ops/pallas/warp.py): exact equality for
locally-smooth flows whose per-(8,128)-tile source spread fits the
static window.  Flows here are bilinear upsamplings of coarse grids —
the same structure IFNet produces.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from rife_tpu.ops import resize_bilinear, warp_xla
from rife_tpu.ops.pallas.warp import warp_pallas


def smooth_flow(rng, n, h, w, cell, mag):
    coarse = rng.standard_normal((n, max(h // cell, 1), max(w // cell, 1), 2)).astype(np.float32) * mag
    return resize_bilinear(jnp.asarray(coarse), (h, w))


@pytest.mark.parametrize("n,h,w,c,cell,mag", [
    (1, 32, 128, 3, 32, 4.0),
    (2, 64, 256, 3, 64, 4.0),
    (1, 40, 100, 2, 32, 3.0),
    (1, 64, 384, 16, 64, 6.0),   # feature-map channel blocking path
])
def test_pallas_warp_matches_xla(rng, n, h, w, c, cell, mag):
    img = jnp.asarray(rng.random((n, h, w, c), dtype=np.float32))
    flow = smooth_flow(rng, n, h, w, cell, mag)
    ref = warp_xla(img, flow)
    got = warp_pallas(img, flow, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_pallas_warp_identity_and_constant(rng):
    img = jnp.asarray(rng.random((1, 16, 256, 3), dtype=np.float32))
    zero = jnp.zeros((1, 16, 256, 2), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(warp_pallas(img, zero, interpret=True)), np.asarray(img), atol=1e-6
    )
    const = zero.at[..., 0].set(5.0).at[..., 1].set(-3.0)
    np.testing.assert_allclose(
        np.asarray(warp_pallas(img, const, interpret=True)),
        np.asarray(warp_xla(img, const)),
        atol=1e-5,
    )


def test_pallas_warp_bf16_io(rng):
    img = jnp.asarray(rng.random((1, 32, 128, 3), dtype=np.float32)).astype(jnp.bfloat16)
    flow = smooth_flow(rng, 1, 32, 128, 32, 2.0).astype(jnp.bfloat16)
    out = warp_pallas(img, flow, interpret=True)
    assert out.dtype == jnp.bfloat16
    ref = warp_xla(img.astype(jnp.float32), flow.astype(jnp.float32))
    assert float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref))) < 0.02
