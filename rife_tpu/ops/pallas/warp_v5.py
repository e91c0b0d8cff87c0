"""Pallas warp kernel v5: packed x-taps + dynamic row-windowed DMA.

Two structural changes over v4 (warp_v4.py), same merged-row design:

1. **Packed horizontal taps.**  The plane is pre-packed in XLA so that
   f32 lane x holds (bf16(img[x]), bf16(img[x+1])): ONE lane gather
   returns both bilinear x-taps, halving the dynamic-gather count (the
   kernel's dominant cost) and deleting the lane-carry/next-block mask
   logic — the +1 tap can never live in a different 128-lane block, so
   the 127-lane alignment escape of v3/v4 disappears for the x+1 tap.
   Taps are read at bf16 precision: identical to v3/v4 on the bf16
   serving path (planes are stored bf16 there anyway); f32 inputs keep
   using v3/v4 (see warp_pallas_auto).

2. **Dynamic row windows.**  Instead of keeping the whole padded plane
   resident in VMEM (which capped the channel block at 1 for 720p
   images and OOMs beyond ~1080p), the plane is passed twice with
   scalar-prefetch-driven index_maps selecting two consecutive 32-row
   blocks per program — a 64-row window around the program's minimum
   source row.  VMEM per channel drops from O(H*W) to O(64*W), so all
   channels ride one program group and Pallas pipelines the window DMA
   behind compute.

Window contract: exact vs the ops.warp_xla semantics (border clamp,
align_corners pixel units) whenever each program's source rows fit
[32*k, 32*k+64) for the program-wide anchor k and each (8,128) output
subtile's x-span fits the v4 x-window (wx..wx+win_w).  Escapes clamp to
the window edge (same class as v3/v4, see warp.py docstring); RIFE
flows are bilinearly-upsampled coarse outputs and stay well inside.

Reference semantics being reproduced: model/warplayer.py:6-22 (the
torch grid_sample backward warp).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rife_tpu.ops.pallas.warp import (
    SUB_H,
    SUB_W,
    TILE_H,
    TILE_W,
    _ceil_to,
    _source_coords,
    _VMEM_IMG_BUDGET,
)

WIN_ROWS = 32  # half-window granularity (two consecutive blocks per program)


def _tile_scalars_v5(flow, H, W, HP, WP, win_w, tile_h):
    """Per-(8,128)-subtile [ystart, wx, y2, x_lo, x_hi] (v4 layout, with
    x_hi NOT extended by +1 — the packed tap covers the neighbour) plus a
    per-program row-block anchor for the window index_map."""
    y0i, x0i, _, _ = _source_coords(flow, H, W)

    def _rw(x, wdim):
        mn = lax.reduce_window(x, jnp.int32(2**30), lax.min,
                               window_dimensions=(1,) + wdim,
                               window_strides=(1,) + wdim, padding="VALID")
        mx = lax.reduce_window(x, jnp.int32(-(2**30)), lax.max,
                               window_dimensions=(1,) + wdim,
                               window_strides=(1,) + wdim, padding="VALID")
        return mn, mx

    y_min, y_max = _rw(y0i, (SUB_H, SUB_W))
    x_min, x_max = _rw(x0i, (SUB_H, SUB_W))

    ystart = jnp.minimum(y_min, HP - SUB_H)
    wx = jnp.clip((x_min // SUB_W) * SUB_W, 0, max(WP - win_w, 0))
    y2 = ((y_max + 1 >= ystart + SUB_H).astype(jnp.int32)
          + (y_max + 1 >= ystart + 2 * SUB_H).astype(jnp.int32))
    sc = jnp.stack([
        ystart.reshape(-1), wx.reshape(-1), y2.reshape(-1),
        x_min.reshape(-1), x_max.reshape(-1),
    ]).astype(jnp.int32)

    # Program-level anchor: the window [32k, 32k+64) must cover the
    # program's source rows [ty_min, ty_max+1].  Snapping ty_min down
    # wastes up to 31 rows (measured: systematic bottom-row escapes even
    # for tiny flows), so pick the HIGHEST block k whose window still
    # covers the top row: k = clip(ceil((ty_max+2-64)/32), 0, ty_min//32).
    # When the span fits 64 rows this covers it exactly; when it does
    # not, the window anchors at the top and the bottom clamps (the v4
    # escape class).
    ty_min, ty_max = _rw(y0i, (tile_h, TILE_W))
    pstart = jnp.minimum(ty_min, HP - SUB_H)
    max_blk = max(HP // WIN_ROWS - 2, 0)
    want = -((2 * WIN_ROWS - 2 - ty_max) // WIN_ROWS)  # ceil((ty_max+2-64)/32)
    rowblk = jnp.clip(want, 0, jnp.minimum(pstart // WIN_ROWS, max_blk))
    return sc, rowblk.reshape(-1).astype(jnp.int32)


def _warp_kernel_v5(sc_ref, rb_ref, imgA_ref, imgB_ref, flow_ref, out_ref,
                    acc_ref, *, H, W, HP, WP, win_w, cb, cg, nsh, nsw, nth,
                    ntw, tile_h, skip):
    g0 = pl.program_id(0)
    ti = pl.program_id(1)
    tj = pl.program_id(2)
    n = g0 // cg

    iota_s = lax.broadcasted_iota(jnp.int32, (SUB_H, SUB_W), 0)
    n_blk = win_w // SUB_W
    win_base = rb_ref[(n * nth + ti) * ntw + tj] * WIN_ROWS

    for s_i in range(tile_h // SUB_H):
        for s_j in range(TILE_W // SUB_W):
            si = ti * (tile_h // SUB_H) + s_i
            sj = tj * (TILE_W // SUB_W) + s_j
            flat = (n * nsh + si) * nsw + sj
            ystart = sc_ref[0, flat]
            wx = pl.multiple_of(sc_ref[1, flat], SUB_W)
            y2 = sc_ref[2, flat]
            x_lo = sc_ref[3, flat]
            x_hi = sc_ref[4, flat]

            rsl = slice(s_i * SUB_H, (s_i + 1) * SUB_H)
            csl = slice(s_j * SUB_W, (s_j + 1) * SUB_W)
            fdx = flow_ref[0, 0, rsl, csl]
            fdy = flow_ref[0, 1, rsl, csl]
            ys = (iota_s + si * SUB_H).astype(jnp.float32)
            xs = (lax.broadcasted_iota(jnp.int32, (SUB_H, SUB_W), 1)
                  + sj * SUB_W).astype(jnp.float32)
            ix = jnp.clip(xs + fdx, 0.0, W - 1)
            iy = jnp.clip(ys + fdy, 0.0, H - 1)
            x0 = jnp.floor(ix)
            fx = ix - x0

            yrel = jnp.clip(iy - ystart.astype(jnp.float32),
                            0.0, 3.0 * SUB_H - 1.0)
            rx = jnp.clip(x0.astype(jnp.int32) - wx, 0, win_w - 1)
            lane_blk = rx // SUB_W
            lane_off = rx % SUB_W

            ya0 = pl.multiple_of((ystart // SUB_H) * SUB_H, SUB_H)
            ky = ystart - ya0
            idx_a = jnp.clip(ky + iota_s, 0, SUB_H - 1)
            idx_b = jnp.clip(ky + iota_s - SUB_H, 0, SUB_H - 1)
            sel_y = (ky + iota_s) <= (SUB_H - 1)

            osl = (slice(s_i * SUB_H, (s_i + 1) * SUB_H),
                   slice(s_j * SUB_W, (s_j + 1) * SUB_W))
            for c in range(cb):
                acc_ref[c] = jnp.zeros((SUB_H, SUB_W), jnp.float32)

            def load8(row):
                """8 aligned rows [row, row+8) from the 64-row A|B window,
                as a function returning per-channel loads.  `row` is plane
                -absolute, 8-aligned, guaranteed >= win_base by the anchor
                construction; rows beyond the window clamp to its top."""
                rel = jnp.clip(row - win_base, 0, 2 * WIN_ROWS - SUB_H)
                in_a = rel < WIN_ROWS
                offA = pl.multiple_of(
                    jnp.where(in_a, rel, 0), SUB_H)
                offB = pl.multiple_of(
                    jnp.where(in_a, 0, rel - WIN_ROWS), SUB_H)
                return rel, in_a, offA, offB

            def piece(m):
                la = jnp.minimum(ya0 + SUB_H * m, HP - SUB_H)
                lb = jnp.minimum(ya0 + SUB_H * (m + 1), HP - SUB_H)
                _, a_in_a, a_offA, a_offB = load8(la)
                _, b_in_a, b_offA, b_offB = load8(lb)
                w_rows = [
                    jnp.maximum(0.0, 1.0 - jnp.abs(SUB_H * m + s - yrel))
                    for s in range(SUB_H)
                ]
                for b in range(n_blk):
                    blk_on = jnp.logical_and(wx + b * SUB_W <= x_hi,
                                             wx + (b + 1) * SUB_W - 1 >= x_lo)
                    if not skip:
                        blk_on = jnp.bool_(True)

                    @pl.when(blk_on)
                    def _blk():
                        m0 = jnp.where(lane_blk == b, 1.0 - fx, 0.0)
                        m1 = jnp.where(lane_blk == b, fx, 0.0)
                        xsl = pl.ds(wx + b * SUB_W, SUB_W)
                        for c in range(cb):
                            a = jnp.where(
                                a_in_a,
                                imgA_ref[0, c, pl.ds(a_offA, SUB_H), xsl],
                                imgB_ref[0, c, pl.ds(a_offB, SUB_H), xsl])
                            bch = jnp.where(
                                b_in_a,
                                imgA_ref[0, c, pl.ds(b_offA, SUB_H), xsl],
                                imgB_ref[0, c, pl.ds(b_offB, SUB_H), xsl])
                            merged = jnp.where(
                                sel_y,
                                jnp.take_along_axis(a, idx_a, axis=0),
                                jnp.take_along_axis(bch, idx_b, axis=0))
                            acc = acc_ref[c]
                            for s in range(SUB_H):
                                src8 = jnp.broadcast_to(
                                    merged[s:s + 1, :], (SUB_H, SUB_W))
                                g = jnp.take_along_axis(src8, lane_off, axis=1)
                                u = lax.bitcast_convert_type(g, jnp.uint32)
                                v0 = lax.bitcast_convert_type(
                                    u << 16, jnp.float32)
                                v1 = lax.bitcast_convert_type(
                                    (u >> 16) << 16, jnp.float32)
                                acc = acc + (v0 * m0 + v1 * m1) * w_rows[s]
                            acc_ref[c] = acc

            piece(0)

            @pl.when(y2 >= 1)
            def _p1():
                piece(1)

            @pl.when(y2 >= 2)
            def _p2():
                piece(2)

            for c in range(cb):
                out_ref[(0, c) + osl] = acc_ref[c].astype(out_ref.dtype)


def _pack_pairs(planes_bf16: jnp.ndarray) -> jnp.ndarray:
    """(N, C, H, W) bf16 -> f32 where lane x packs (img[x], img[x+1])
    (edge clamp) as (low16, high16)."""
    a = planes_bf16
    b = jnp.concatenate([a[..., 1:], a[..., -1:]], axis=-1)
    lo = lax.bitcast_convert_type(a, jnp.uint16).astype(jnp.uint32)
    hi = lax.bitcast_convert_type(b, jnp.uint16).astype(jnp.uint32)
    return lax.bitcast_convert_type(lo | (hi << 16), jnp.float32)


@functools.partial(jax.jit, static_argnames=("win_w", "interpret", "skip",
                                             "tile_h"))
def warp_pallas_v5(img: jnp.ndarray, flow: jnp.ndarray, *, win_w: int = 256,
                   interpret: bool = False, skip: bool | None = None,
                   tile_h: int = TILE_H) -> jnp.ndarray:
    """Backward bilinear warp, v5 packed/windowed kernel.

    img: (N, H, W, C) — any float dtype; taps are read at bf16 precision
    (the serving-path plane storage).  flow: (N, H, W, 2) pixel units.
    """
    n, h, w, c = img.shape
    out_dtype = img.dtype
    if not interpret and jax.default_backend() != "tpu":
        interpret = True

    hp = max(_ceil_to(h, tile_h), 2 * WIN_ROWS)
    wp = _ceil_to(w, TILE_W)
    win_w = min(win_w, wp)

    # Window residency: 2 x WIN_ROWS x wp f32 per channel (+ out tile).
    per_cb = 2 * WIN_ROWS * wp * 4 + tile_h * TILE_W * 4
    cb = max(1, min(c, _VMEM_IMG_BUDGET // per_cb))
    while c % cb:
        cb -= 1
    cg = c // cb
    if skip is None:
        skip = True

    planes = jnp.moveaxis(img, -1, 1).astype(jnp.bfloat16)
    flow_pl = jnp.moveaxis(flow, -1, 1).astype(jnp.float32)
    if (hp, wp) != (h, w):
        planes = jnp.pad(planes, ((0, 0), (0, 0), (0, hp - h), (0, wp - w)))
        flow_pl = jnp.pad(flow_pl, ((0, 0), (0, 0), (0, hp - h), (0, wp - w)))
    packed = _pack_pairs(planes)

    scalars, rowblk = _tile_scalars_v5(
        jnp.moveaxis(flow_pl, 1, -1), h, w, hp, wp, win_w, tile_h)

    nth = hp // tile_h
    ntw = wp // TILE_W
    grid = (n * cg, nth, ntw)
    kernel = functools.partial(
        _warp_kernel_v5, H=h, W=w, HP=hp, WP=wp, win_w=win_w, cb=cb, cg=cg,
        nsh=hp // SUB_H, nsw=wp // SUB_W, nth=nth, ntw=ntw, tile_h=tile_h,
        skip=skip)

    def win_index(g, i, j, sc, rb, *, cg=cg, nth=nth, ntw=ntw, delta=0):
        nn = g // cg
        return (nn, g % cg, rb[(nn * nth + i) * ntw + j] + delta, 0)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, cb, WIN_ROWS, wp),
                             functools.partial(win_index, delta=0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, cb, WIN_ROWS, wp),
                             functools.partial(win_index, delta=1),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2, tile_h, TILE_W),
                             lambda g, i, j, sc, rb, cg=cg: (g // cg, 0, i, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, cb, tile_h, TILE_W),
                lambda g, i, j, sc, rb, cg=cg: (g // cg, g % cg, i, j),
                memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((cb, SUB_H, SUB_W), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((n, c, hp, wp), jnp.bfloat16),
        interpret=interpret,
    )(scalars, rowblk, packed, packed, flow_pl)

    out = out[:, :, :h, :w]
    return jnp.moveaxis(out, 1, -1).astype(out_dtype)
