"""Pallas TPU backward-warp kernel.

Why: XLA lowers the per-pixel bilinear gather to a scalar loop on TPU
(~19 ms per 720p warp — measured, tools/profile_warp_variants.py).  The
hardware gather primitive (Mosaic tpu.dynamic_gather) shuffles a single
(8, 128) f32 vreg along one axis — measured O(1) — and a true 2-D
per-element gather cannot be composed from two 1-D shuffles (the index
maps conflict), so this kernel exploits the structure of RIFE flows:
they are bilinearly-upsampled coarse network outputs, locally smooth
even when large in magnitude.

Design (v3):
- Every (8, 128) output subtile reads its sources from a small dynamic
  window anchored at the subtile's minimum integer source coordinate.
  Anchors and loop bounds are precomputed in XLA (reduce_window min/max)
  and passed as scalar-prefetch arrays — the kernel does no
  vector->scalar reductions (stalls dominated v1).
- Within the window the kernel walks the actually-needed aligned
  (8, 128) source vregs; each source row is statically sliced,
  sublane-broadcast, and lane-shuffled by the per-pixel x-offset,
  accumulating bilinear weights.  Work scales with the tile's true
  source spread, not the window size.
- The measured per-program floor on this stack is ~0.8 us, so programs
  are fat: each handles a (32, 256) tile (8 subtiles) x a block of
  channels (by VMEM budget), amortizing dispatch and letting feature-map
  warps (C = 16..128, reference refine.py:44-57) share one program's
  index math across channels.

Semantics: identical to rife_tpu.ops.warp_xla (border clamp,
align_corners pixel units) whenever each 8x128 subtile's source spread
fits the window (win_h-2 rows, win_w-2-minus-alignment columns).
Out-of-window sources clamp to the window edge.  With the default
win_w=256 the 128-aligned anchor can waste up to 127 columns, so edge
subtiles escape on ~0.1% of pixels by ~2e-2 even for smooth flows
(measured on the demo frame) — below the bf16 quantization noise of the
serving path and ~64 dB-equivalent, i.e. invisible next to a 35 dB
signal.  win_w=384 removes those escapes at +56% image-warp cost
(measured); pass it where bit-exactness vs warp_xla matters.
Correctness tests run the exact XLA warp; rife_tpu.ops.warp dispatches
to this kernel on TPU.

Training: `warp_pallas_diff` (NHWC) wraps the kernel in a custom VJP
whose backward runs the exact XLA warp's gradient.  The plane-layout
`warp_planes_pallas_diff` (ops/warp.py) — the path the plane-major
student loop and the teacher pair actually train through — instead
takes d/flow from the v5 kernel's emitted dI/dx, dI/dy
(emit_grads=True, one fused pass) and d/img from the flow-stopped
scatter adjoint: 288.6 -> 124.2 ms/step at the reference config
(tools/r3_exp23.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB_H = 8        # subtile = one f32 vreg
SUB_W = 128
TILE_H = 32      # output tile per program: 4 x 2 subtiles
TILE_W = 256


def _source_coords(flow, H, W):
    """Integer corner + fraction of the clamped source coordinates."""
    shp = flow.shape[:-1]
    ys = lax.broadcasted_iota(jnp.int32, shp, len(shp) - 2).astype(jnp.float32)
    xs = lax.broadcasted_iota(jnp.int32, shp, len(shp) - 1).astype(jnp.float32)
    ix = jnp.clip(xs + flow[..., 0].astype(jnp.float32), 0.0, W - 1)
    iy = jnp.clip(ys + flow[..., 1].astype(jnp.float32), 0.0, H - 1)
    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    return y0.astype(jnp.int32), x0.astype(jnp.int32), (iy - y0), (ix - x0)


def _tile_scalars(flow, H, W, HP, WP, win_h, win_w):
    """Per-(8,128)-subtile window anchors + source extents (XLA-side
    reduce_window min/max).  The extents let the kernel skip source
    chunks/blocks a subtile never samples (the common case: smooth flow
    touches ~2 of the window's 4 row-chunks and 1-2 column blocks)."""
    y0i, x0i, _, _ = _source_coords(flow, H, W)

    def _rw(x, op, init):
        return lax.reduce_window(
            x, init, op,
            window_dimensions=(1, SUB_H, SUB_W),
            window_strides=(1, SUB_H, SUB_W),
            padding="VALID",
        )

    y_min = _rw(y0i, lax.min, jnp.int32(2**30))
    x_min = _rw(x0i, lax.min, jnp.int32(2**30))
    y_max = _rw(y0i, lax.max, jnp.int32(-(2**30)))
    x_max = _rw(x0i, lax.max, jnp.int32(-(2**30)))

    wy = jnp.clip((y_min // SUB_H) * SUB_H, 0, max(HP - win_h, 0))
    wx = jnp.clip((x_min // SUB_W) * SUB_W, 0, max(WP - win_w, 0))
    # ONE flat (6, total) array: SMEM pads each operand's minor dim to
    # 128 lanes, so per-subtile-shaped arrays would cost 192 KB each.
    return jnp.stack([
        wy.reshape(-1), wx.reshape(-1),
        y_min.reshape(-1), y_max.reshape(-1),
        x_min.reshape(-1), x_max.reshape(-1),
    ]).astype(jnp.int32)


def _warp_kernel(sc_ref, img_ref, flow_ref, out_ref, acc_ref,
                 *, H, W, win_h, win_w, cb, cg, nsh, nsw, tile_h=TILE_H,
                 skip=True):
    g0 = pl.program_id(0)
    ti = pl.program_id(1)
    tj = pl.program_id(2)
    n = g0 // cg

    for s_i in range(tile_h // SUB_H):
        for s_j in range(TILE_W // SUB_W):
            si = ti * (tile_h // SUB_H) + s_i
            sj = tj * (TILE_W // SUB_W) + s_j
            flat = (n * nsh + si) * nsw + sj
            wy = pl.multiple_of(sc_ref[0, flat], SUB_H)
            wx = pl.multiple_of(sc_ref[1, flat], SUB_W)
            y_lo = sc_ref[2, flat]
            y_hi = sc_ref[3, flat] + 1  # +1 neighbor row
            x_lo = sc_ref[4, flat]
            x_hi = sc_ref[5, flat] + 1

            rsl = slice(s_i * SUB_H, (s_i + 1) * SUB_H)
            csl = slice(s_j * SUB_W, (s_j + 1) * SUB_W)
            fdx = flow_ref[0, 0, rsl, csl]
            fdy = flow_ref[0, 1, rsl, csl]
            ys = (lax.broadcasted_iota(jnp.int32, (SUB_H, SUB_W), 0)
                  + si * SUB_H).astype(jnp.float32)
            xs = (lax.broadcasted_iota(jnp.int32, (SUB_H, SUB_W), 1)
                  + sj * SUB_W).astype(jnp.float32)
            ix = jnp.clip(xs + fdx, 0.0, W - 1)
            iy = jnp.clip(ys + fdy, 0.0, H - 1)
            x0 = jnp.floor(ix)
            y0 = jnp.floor(iy)
            fx = ix - x0
            fy = iy - y0

            # Window-relative coords; at the window's last row/column the
            # +1 neighbor is folded into the base sample (exact at true
            # borders where the fraction is 0; clamp for escapees).
            ry = jnp.clip(y0.astype(jnp.int32) - wy, 0, win_h - 1)
            rx = jnp.clip(x0.astype(jnp.int32) - wx, 0, win_w - 1)
            fy = jnp.where(ry == win_h - 1, 0.0, fy)
            fx = jnp.where(rx == win_w - 1, 0.0, fx)

            lane_blk = rx // SUB_W
            lane_off = rx % SUB_W
            lane_off1 = lane_off + 1
            carry = lane_off1 == SUB_W
            lane_blk1 = lane_blk + carry.astype(jnp.int32)
            lane_off1 = jnp.where(carry, 0, lane_off1)

            n_ch = win_h // SUB_H
            n_blk = win_w // SUB_W
            osl = (slice(s_i * SUB_H, (s_i + 1) * SUB_H),
                   slice(s_j * SUB_W, (s_j + 1) * SUB_W))
            for c in range(cb):
                acc_ref[c] = jnp.zeros((SUB_H, SUB_W), jnp.float32)

            for ch in range(n_ch):
                r_lo = ch * SUB_H
                # Skip source row-chunks this subtile never samples
                # (weights there are identically zero).
                chunk_on = jnp.logical_and(wy + r_lo <= y_hi,
                                           wy + r_lo + SUB_H - 1 >= y_lo)
                if not skip:
                    chunk_on = jnp.bool_(True)

                @pl.when(chunk_on)
                def _chunk():
                    # Row weights: shared across blocks and channels.
                    # (Per-row pl.when predication was tried and is a
                    # clear loss — img warps 28 vs 6 ms, features 16 vs
                    # 10: the guard + scratch round-trip per row costs
                    # more than the 2 gathers it saves.  Chunk/block
                    # granularity is the right skip level.)
                    w_rows = [
                        jnp.where(ry == r, 1.0 - fy, 0.0)
                        + jnp.where(ry + 1 == r, fy, 0.0)
                        for r in range(r_lo, r_lo + SUB_H)
                    ]
                    for b in range(n_blk):
                        blk_on = jnp.logical_and(wx + b * SUB_W <= x_hi,
                                                 wx + (b + 1) * SUB_W - 1 >= x_lo)
                        if not skip:
                            blk_on = jnp.bool_(True)

                        @pl.when(blk_on)
                        def _block():
                            m0 = jnp.where(lane_blk == b, 1.0 - fx, 0.0)
                            m1 = jnp.where(lane_blk1 == b, fx, 0.0)
                            # Combined x/y weights shared across channels.
                            w0s = [w_rows[s] * m0 for s in range(SUB_H)]
                            w1s = [w_rows[s] * m1 for s in range(SUB_H)]
                            for c in range(cb):
                                chunk = img_ref[0, c, pl.ds(wy + r_lo, SUB_H),
                                                pl.ds(wx + b * SUB_W, SUB_W)]
                                chunk = chunk.astype(jnp.float32)
                                acc = acc_ref[c]
                                for s in range(SUB_H):
                                    src8 = jnp.broadcast_to(
                                        chunk[s:s + 1, :], (SUB_H, SUB_W))
                                    g0v = jnp.take_along_axis(src8, lane_off, axis=1)
                                    g1v = jnp.take_along_axis(src8, lane_off1, axis=1)
                                    acc = acc + (g0v * w0s[s] + g1v * w1s[s])
                                acc_ref[c] = acc

            for c in range(cb):
                out_ref[(0, c) + osl] = acc_ref[c].astype(out_ref.dtype)


def _ceil_to(v, m):
    return -(-v // m) * m


# VMEM budget for the per-program image block.  Pallas double-buffers
# every block, so the effective footprint is 2x this.  bf16 planes halve
# the per-plane cost, letting a 720p 3-channel image warp run as ONE
# program group (index math and weights shared across channels).
_VMEM_IMG_BUDGET = int(5.6 * 1024 * 1024)


@functools.partial(jax.jit, static_argnames=(
    "win_h", "win_w", "interpret", "skip", "tile_h"))
def warp_pallas(img: jnp.ndarray, flow: jnp.ndarray, *, win_h: int = 32,
                win_w: int = 256, interpret: bool = False,
                skip: bool | None = None, tile_h: int = TILE_H) -> jnp.ndarray:
    """Backward bilinear warp, Pallas fast path.

    img: (N, H, W, C); flow: (N, H, W, 2).  Returns (N, H, W, C) in
    img.dtype.  See module docstring for the smoothness contract.

    skip: predicate away source chunks/blocks the subtile never samples.
    Measured: wins when the channel block is large (guard cost amortizes
    across channels — feature warps 10.1 -> 3.1 ms), loses for 3-channel
    image warps (2.2 ms unguarded vs 3.1).  None = auto by channel block.
    """
    n, h, w, c = img.shape
    out_dtype = img.dtype
    if not interpret and jax.default_backend() != "tpu":
        interpret = True  # CPU/tests: Mosaic only lowers on TPU

    hp = _ceil_to(h, tile_h)
    wp = _ceil_to(w, TILE_W)
    win_h = min(win_h, hp)
    win_w = min(win_w, wp)

    # Planes stay in the input dtype (bf16 on the serving path) and are
    # widened to f32 per chunk inside the kernel — the Mosaic gather
    # needs f32 vregs but VMEM residency is what bounds cb.
    plane_dt = img.dtype if img.dtype == jnp.bfloat16 else jnp.float32
    plane_bytes = hp * wp * jnp.dtype(plane_dt).itemsize
    # Budget counts the full input plane AND the per-channel output tile
    # (f32 accumulator block) — for small padded planes the out tile is
    # the same size as the plane and ignoring it OOMs VMEM (seen at
    # training crop sizes with c=128 features).
    per_cb = plane_bytes + tile_h * TILE_W * 4
    cb = max(1, min(c, _VMEM_IMG_BUDGET // per_cb))
    while c % cb:
        cb -= 1
    cg = c // cb
    if skip is None:
        skip = cb > 4

    planes = jnp.moveaxis(img, -1, 1).astype(plane_dt)
    # Planar (N, 2, H, W) flow: a (..., 2)-minor block would force a 2-lane
    # layout, which Mosaic pads/relayouts per block at huge cost.
    flow_pl = jnp.moveaxis(flow, -1, 1).astype(jnp.float32)
    if (hp, wp) != (h, w):
        planes = jnp.pad(planes, ((0, 0), (0, 0), (0, hp - h), (0, wp - w)))
        flow_pl = jnp.pad(flow_pl, ((0, 0), (0, 0), (0, hp - h), (0, wp - w)))

    scalars = _tile_scalars(
        jnp.moveaxis(flow_pl, 1, -1), h, w, hp, wp, win_h, win_w)

    grid = (n * cg, hp // tile_h, wp // TILE_W)
    kernel = functools.partial(_warp_kernel, H=h, W=w, win_h=win_h, win_w=win_w,
                               cb=cb, cg=cg, nsh=hp // SUB_H, nsw=wp // SUB_W,
                               tile_h=tile_h, skip=skip)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, cb, hp, wp),
                             lambda g, i, j, *_, cg=cg: (g // cg, g % cg, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2, tile_h, TILE_W),
                             lambda g, i, j, *_, cg=cg: (g // cg, 0, i, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, cb, tile_h, TILE_W),
                lambda g, i, j, *_, cg=cg: (g // cg, g % cg, i, j),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[pltpu.VMEM((cb, SUB_H, SUB_W), jnp.float32)],
        ),
        # accumulate f32, store in the plane dtype (halves the output
        # write traffic on the bf16 serving path)
        out_shape=jax.ShapeDtypeStruct((n, c, hp, wp), plane_dt),
        interpret=interpret,
    )(scalars, planes, flow_pl)

    out = out[:, :, :h, :w]
    return jnp.moveaxis(out, 1, -1).astype(out_dtype)


def warp_pallas_auto(img: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """bf16 planes (the serving path) dispatch to the v5 windowed
    merged-row kernel: measured 57.9 vs 53.4 fps/chip end-to-end over
    the previous v3(images)/v4(features) split, with strictly fewer
    window-escape pixels on aggressive flows (tools/r3_exp5.py
    arbitration: image 1.6e-3 vs 3.2e-3 escape frac, feature 1.1e-6 vs
    1.1e-3) and O(96*W) VMEM instead of O(H*W), so it also scales past
    1080p where v3/v4 OOM.

    f32 inputs keep the v3/v4 split: v5 stores its plane taps at bf16
    by design, which would silently quantize the f32 parity paths
    (benchmarks publish f32 numbers through this dispatcher)."""
    if img.dtype == jnp.bfloat16:
        from rife_tpu.ops.pallas.warp_v5 import warp_pallas_v5

        return warp_pallas_v5(img, flow)
    if img.shape[-1] >= 8:
        from rife_tpu.ops.pallas.warp_v4 import warp_pallas_v4

        return warp_pallas_v4(img, flow)
    return warp_pallas(img, flow)


def _diff_fwd(img, flow):
    return warp_pallas_auto(img, flow), (img, flow)


def _diff_bwd(res, g):
    from rife_tpu.ops.warp import warp_xla

    img, flow = res
    _, vjp = jax.vjp(warp_xla, img, flow)
    return tuple(vjp(g))


@jax.custom_vjp
def warp_pallas_diff(img: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Auto-dispatched Pallas warp with gradients: Pallas forward,
    exact-XLA backward."""
    return warp_pallas_auto(img, flow)


warp_pallas_diff.defvjp(_diff_fwd, _diff_bwd)
