"""Pallas warp kernel vs the exact XLA warp (interpret mode on CPU).

The kernel contract (rife_tpu/ops/pallas/warp.py): exact equality for
locally-smooth flows whose per-(8,128)-tile source spread fits the
static window.  Flows here are bilinear upsamplings of coarse grids —
the same structure IFNet produces.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rife_tpu.ops import resize_bilinear, warp_xla
from rife_tpu.ops.pallas.warp import warp_pallas


@pytest.fixture(autouse=True)
def _clear_jax_caches():
    """Interpret-mode kernels compile enormous XLA CPU graphs; letting
    them accumulate across the suite has produced intermittent compiler
    segfaults.  Drop compiled executables after every test here."""
    yield
    jax.clear_caches()


def smooth_flow(rng, n, h, w, cell, mag):
    coarse = rng.standard_normal((n, max(h // cell, 1), max(w // cell, 1), 2)).astype(np.float32) * mag
    return resize_bilinear(jnp.asarray(coarse), (h, w))


@pytest.mark.parametrize("n,h,w,c,cell,mag", [
    (1, 32, 128, 3, 32, 4.0),
    (1, 64, 256, 3, 64, 2.5),
    (1, 40, 100, 2, 32, 3.0),
    (1, 48, 256, 16, 48, 2.5),   # feature-map path
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


def test_warp_pallas_diff_grad_matches_xla(rng):
    """custom_vjp: Pallas forward, exact-XLA gradient (both args)."""
    import jax

    from rife_tpu.ops.pallas.warp import warp_pallas_diff

    n, h, w, c = 1, 24, 128, 3
    img = jnp.asarray(rng.random((n, h, w, c), dtype=np.float32))
    flow = smooth_flow(rng, n, h, w, 32, 2.0)
    # non-integer flow so the bilinear weights (and flow grads) are active
    flow = flow + 0.37

    def loss_p(im, fl):
        return jnp.sum(jnp.sin(warp_pallas_diff(im, fl)))

    def loss_x(im, fl):
        return jnp.sum(jnp.sin(warp_xla(im, fl)))

    gp_img, gp_flow = jax.grad(loss_p, argnums=(0, 1))(img, flow)
    gx_img, gx_flow = jax.grad(loss_x, argnums=(0, 1))(img, flow)
    np.testing.assert_allclose(np.asarray(gp_img), np.asarray(gx_img), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gp_flow), np.asarray(gx_flow), atol=1e-4)


def test_warp_dispatch_uses_diff_wrapper(rng):
    """ops.warp under the pallas impl is differentiable end-to-end."""
    import jax

    from rife_tpu.ops import use_warp_impl, warp

    img = jnp.asarray(rng.random((1, 16, 128, 3), dtype=np.float32))
    flow = smooth_flow(rng, 1, 16, 128, 32, 1.5) + 0.25
    with use_warp_impl("pallas"):
        g = jax.grad(lambda im: jnp.sum(warp(im, flow) ** 2))(img)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.max(jnp.abs(g))) > 0


def test_pallas_warp_alignment_escape_contract(rng):
    """W=448 (not a tile multiple) with smooth flow: the 128-aligned
    window anchor can waste up to 127 columns, so the fast 256-wide
    default lets edge subtiles escape on ~0.1% of pixels (bounded,
    sub-bf16-noise — see the kernel docstring); win_w=384 must be
    exact."""
    img = jnp.asarray(rng.random((1, 64, 448, 3), dtype=np.float32))
    flow = smooth_flow(rng, 1, 64, 448, 32, 2.0)
    ref = np.asarray(warp_xla(img, flow))
    for skip in (True, False):
        exact = warp_pallas(img, flow, interpret=True, skip=skip, win_w=384)
        np.testing.assert_allclose(np.asarray(exact), ref, atol=1e-5)
    fast = np.asarray(warp_pallas(img, flow, interpret=True))
    d = np.abs(fast - ref)
    # escapes clamp a few px short — on this worst-case white-noise image
    # the per-pixel error is O(local variation), but it must stay rare
    assert (d > 1e-5).mean() < 0.01
    assert d.mean() < 1e-3


@pytest.mark.parametrize("n,h,w,c,cell,mag", [
    (1, 32, 128, 3, 32, 4.0),     # 17-row span: needs the 3rd merged piece
    (1, 64, 256, 3, 64, 2.5),
    (1, 48, 256, 16, 48, 2.5),
    (1, 40, 100, 2, 32, 3.0),
])
def test_warp_v4_matches_xla(rng, n, h, w, c, cell, mag):
    from rife_tpu.ops.pallas.warp_v4 import warp_pallas_v4

    img = jnp.asarray(rng.random((n, h, w, c), dtype=np.float32))
    flow = smooth_flow(rng, n, h, w, cell, mag)
    ref = warp_xla(img, flow)
    got = warp_pallas_v4(img, flow, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("n,h,w,c,cell,mag", [
    (1, 32, 128, 3, 32, 4.0),
    (1, 64, 256, 3, 64, 2.5),
    (1, 48, 256, 16, 48, 2.5),
    (1, 40, 100, 2, 32, 3.0),
    (1, 96, 256, 3, 32, 3.0),    # >2 row-window blocks in play
])
def test_warp_v5_matches_xla(rng, n, h, w, c, cell, mag):
    """v5 reads taps at bf16 (the serving-path plane precision), so the
    tolerance is bf16 quantization of the taps, not f32 exactness."""
    from rife_tpu.ops.pallas.warp_v5 import warp_pallas_v5

    img = jnp.asarray(rng.random((n, h, w, c), dtype=np.float32))
    flow = smooth_flow(rng, n, h, w, cell, mag)
    ref = warp_xla(img.astype(jnp.bfloat16), flow).astype(jnp.float32)
    got = warp_pallas_v5(img, flow, interpret=True).astype(jnp.float32)
    assert float(jnp.max(jnp.abs(got - ref))) < 1e-2


def test_warp_v5_block_boundary_anchor(rng):
    """Regression: a tile whose min source row lands just under a 32-row
    block boundary overflowed the old 2-block window at its bottom rows.
    Uniform dy=-1 puts every tile's anchor at 32k-1."""
    from rife_tpu.ops.pallas.warp_v5 import warp_pallas_v5

    img = jnp.asarray(rng.random((1, 96, 128, 3), dtype=np.float32))
    flow = jnp.zeros((1, 96, 128, 2), jnp.float32).at[..., 1].set(-1.25)
    ref = warp_xla(img.astype(jnp.bfloat16), flow).astype(jnp.float32)
    got = warp_pallas_v5(img, flow, interpret=True).astype(jnp.float32)
    assert float(jnp.max(jnp.abs(got - ref))) < 1e-2


def test_warp_auto_dispatch(rng):
    """f32 inputs keep the exact v3/v4 split (f32 planes, atol 1e-5);
    bf16 inputs (the serving path) route to v5, whose taps are bf16 by
    design."""
    from rife_tpu.ops.pallas.warp import warp_pallas_auto

    for c in (3, 16):
        img = jnp.asarray(rng.random((1, 32, 256, c), dtype=np.float32))
        flow = smooth_flow(rng, 1, 32, 256, 32, 2.0)
        ref = warp_xla(img, flow)
        got = warp_pallas_auto(img, flow)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

        if c == 3:  # one interpret-mode v5 compile keeps the test cheap
            got16 = warp_pallas_auto(img.astype(jnp.bfloat16), flow)
            assert got16.dtype == jnp.bfloat16
            ref16 = warp_xla(img.astype(jnp.bfloat16), flow).astype(jnp.float32)
            assert float(jnp.max(jnp.abs(
                got16.astype(jnp.float32) - ref16))) < 1e-2


def test_warp_xla_planes_matches_nhwc(rng):
    """Plane-layout exact warp == NHWC exact warp (layout only)."""
    from rife_tpu.ops import warp_xla_planes

    n, h, w, c = 2, 24, 96, 5
    img = jnp.asarray(rng.random((n, h, w, c), dtype=np.float32))
    flow = smooth_flow(rng, n, h, w, 24, 3.0) + 0.41
    flow4 = jnp.concatenate([flow, flow], -1)[..., :2]
    ref = warp_xla(img, flow4)
    got = warp_xla_planes(jnp.moveaxis(img, -1, 1), jnp.moveaxis(flow4, -1, 1))
    np.testing.assert_allclose(
        np.asarray(jnp.moveaxis(got, 1, -1)), np.asarray(ref), atol=1e-5)


def test_warp_planes_pallas_diff_fwd_and_grad(rng):
    """Plane-native v5 wrapper: interpret forward matches the exact
    plane warp at bf16 tolerance; d/img is the exact-XLA scatter
    adjoint, d/flow comes from the kernel's emitted dI/dx, dI/dy (bf16
    taps — this is the path the plane-major student loop trains
    through)."""
    from rife_tpu.ops.warp import warp_planes_pallas_diff, warp_xla_planes

    n, h, w, c = 1, 32, 128, 3
    img_pl = jnp.asarray(
        rng.random((n, c, h, w), dtype=np.float32))
    flow = smooth_flow(rng, n, h, w, 32, 2.0) + 0.37
    flow_pl = jnp.moveaxis(flow, -1, 1)

    out = warp_planes_pallas_diff(img_pl, flow_pl)
    ref = warp_xla_planes(img_pl, flow_pl)
    assert float(jnp.max(jnp.abs(out - ref))) < 0.02  # bf16 taps

    # Linear loss: the cotangent is primal-independent, so d/img (the
    # flow-stopped scatter adjoint) must match to float tolerance;
    # d/flow carries the kernel's bf16 tap noise.
    wts = jnp.asarray(rng.random((n, c, h, w), dtype=np.float32))

    def loss_p(im, fl):
        return jnp.sum(wts * warp_planes_pallas_diff(im, fl))

    def loss_x(im, fl):
        return jnp.sum(wts * warp_xla_planes(im, fl))

    gp_img, gp_flow = jax.grad(loss_p, argnums=(0, 1))(img_pl, flow_pl)
    gx_img, gx_flow = jax.grad(loss_x, argnums=(0, 1))(img_pl, flow_pl)
    np.testing.assert_allclose(np.asarray(gp_img), np.asarray(gx_img),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(gp_flow), np.asarray(gx_flow),
                               atol=0.02)


def test_warp2_planes_pair_equivalence(rng):
    """warp2_planes == two warp_planes calls (batch-concat contract)."""
    from rife_tpu.ops import warp2_planes
    from rife_tpu.ops.warp import warp_xla_planes

    n, h, w = 1, 16, 128
    i0 = jnp.asarray(rng.random((n, 3, h, w), dtype=np.float32))
    i1 = jnp.asarray(rng.random((n, 3, h, w), dtype=np.float32))
    f0 = jnp.moveaxis(smooth_flow(rng, n, h, w, 16, 1.5), -1, 1)
    f1 = jnp.moveaxis(smooth_flow(rng, n, h, w, 16, 1.5), -1, 1)
    w0, w1 = warp2_planes(i0, i1, f0, f1)
    np.testing.assert_allclose(np.asarray(w0), np.asarray(warp_xla_planes(i0, f0)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(warp_xla_planes(i1, f1)), atol=1e-5)


@pytest.mark.parametrize("n,c,h,w", [
    (2, 3, 40, 136),   # narrow path: tile_w=128, one lane block
    (1, 3, 40, 512),   # serving-shape path: tile_w=256, two lane blocks
])
def test_warp_pair_blend_fused_matches_v5_and_composed(rng, n, c, h, w):
    """Fused pair-warp + sigmoid blend (ops/pallas/warp_blend.py):
    w0/w1 bit-exact vs the v5 kernel; blend within one bf16 ulp of the
    composed v5 + XLA blend (single f32 rounding); blend-only variant
    identical to the pair variant's blend."""
    from rife_tpu.ops.pallas.warp_blend import warp_pair_blend_pl
    from rife_tpu.ops.pallas.warp_v5 import warp_pallas_v5_pl
    img0 = jnp.asarray(rng.random((n, c, h, w), np.float32)).astype(jnp.bfloat16)
    img1 = jnp.asarray(rng.random((n, c, h, w), np.float32)).astype(jnp.bfloat16)
    fl = jnp.moveaxis(smooth_flow(rng, n, h, w, 32, 3.0), -1, 1)
    flow = jnp.concatenate([fl, -fl], 1)
    mask = jnp.asarray((rng.random((n, 1, h, w), np.float32) - 0.5) * 4)

    blend, w0, w1 = warp_pair_blend_pl(img0, img1, flow, mask, emit_pair=True)
    v0 = warp_pallas_v5_pl(img0, flow[:, 0:2])
    v1 = warp_pallas_v5_pl(img1, flow[:, 2:4])
    assert np.array_equal(np.asarray(w0, np.float32), np.asarray(v0, np.float32))
    assert np.array_equal(np.asarray(w1, np.float32), np.asarray(v1, np.float32))
    sig = jax.nn.sigmoid(mask.astype(jnp.bfloat16))
    comp = (v0 * sig + v1 * (1 - sig)).astype(jnp.bfloat16)
    d = np.abs(np.asarray(blend, np.float32) - np.asarray(comp, np.float32))
    assert d.max() <= 2 ** -7, d.max()  # one bf16 ulp at |x| <= 1

    b2 = warp_pair_blend_pl(img0, img1, flow, mask, emit_pair=False)
    assert np.array_equal(np.asarray(b2, np.float32),
                          np.asarray(blend, np.float32))


def test_warp2_blend_planes_grad_routes_through_composed(rng):
    """The fused op is differentiable: its VJP delegates to the composed
    pair-warp + blend (kernel-grad warp VJP), so v4.25 training works
    with warp_impl=pallas when the fusion is enabled (the fusion is
    default-off since its r5 A/B negative; enable it explicitly here so
    the fused path stays covered)."""
    from rife_tpu.ops import use_fuse_blend, use_warp_impl, warp2_blend_planes

    n, c, h, w = 1, 3, 16, 128
    img0 = jnp.asarray(rng.random((n, c, h, w), np.float32))
    img1 = jnp.asarray(rng.random((n, c, h, w), np.float32))
    fl = jnp.moveaxis(smooth_flow(rng, n, h, w, 16, 1.5), -1, 1)
    flow = jnp.concatenate([fl, -fl], 1)
    mask = jnp.asarray((rng.random((n, 1, h, w), np.float32) - 0.5))

    def loss(impl):
        def f(i0, i1, fl, m):
            with use_warp_impl(impl), use_fuse_blend(impl == "pallas"):
                out = warp2_blend_planes(i0, i1, fl, m, need_pair=False)
            return jnp.sum(out.astype(jnp.float32) ** 2)
        return jax.grad(f, argnums=(0, 2, 3))(img0, img1, flow, mask)

    g_pallas = loss("pallas")
    g_xla = loss("xla")
    for gp, gx, name in zip(g_pallas, g_xla, ("img0", "flow", "mask")):
        gp, gx = np.asarray(gp, np.float32), np.asarray(gx, np.float32)
        # pallas bwd recomputes through the composed path with bf16
        # rounding of the primal; tolerances follow the diff-warp tests
        assert np.abs(gp - gx).max() < 0.15, (name, np.abs(gp - gx).max())
        denom = max(1e-3, np.abs(gx).max())
        assert np.abs(gp - gx).max() / denom < 0.08, name
