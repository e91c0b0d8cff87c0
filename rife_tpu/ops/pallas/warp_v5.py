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
   images and OOMs beyond ~1080p), the plane is passed three times with
   scalar-prefetch-driven index_maps selecting three consecutive 32-row
   blocks per program — a 96-row window anchored at (or just below) the
   program's minimum source row.  VMEM per channel drops from O(H*W) to
   O(96*W), so all channels ride one program group and Pallas pipelines
   the window DMA behind compute.  (A 2-block/64-row window was tried
   first: block alignment wastes up to 31 rows below the anchor, so it
   guarantees only 33 usable rows above ty_min — measured as systematic
   bottom-row escapes whenever a tile's min source row landed just
   under a 32-row boundary.  Three blocks guarantee >= 65.)

Window contract: exact vs the ops.warp_xla semantics (border clamp,
align_corners pixel units) whenever (a) each program's (32 x 256)
output tile has a source-row span <= 65 rows, (b) each (8,128) output
subtile's row span fits the 3-piece merge (<= 23 rows, same as v4) and
(c) its x-span fits the v3/v4 x-window (wx..wx+win_w, 128-aligned
anchor).  Escapes clamp to the window edge (same class as v3/v4, see
warp.py docstring); RIFE flows are bilinearly-upsampled coarse outputs
and stay well inside (a)-(b); (c) escapes match v3/v4 by construction.

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


def _tile_scalars_v5(flow, H, W, HP, WP, win_w, tile_h, tile_w=TILE_W):
    """Per-(8,128)-subtile [ystart, wx, y2, x_lo, x_hi] (v4 layout, with
    x_hi NOT extended by +1 — the packed tap covers the neighbour) plus a
    per-program row-block anchor for the window index_map."""
    y0i, x0i, _, _ = _source_coords(flow, H, W)
    return _tile_scalars_v5_from_corners(y0i, x0i, HP, WP, win_w, tile_h,
                                         tile_w)


def _tile_scalars_v5_pl(flow_pl, H, W, HP, WP, win_w, tile_h,
                        tile_w=TILE_W):
    """Same scalars computed from (N, 2, HP, WP) flow planes — the
    reduce_windows then run on dense (H, W)-tiled data instead of the
    2-lane-sparse NHWC layout (measured 0.65 ms -> ~0.1 ms per call at
    720p b4, tools/r3_exp6.py vs r3_exp9.py)."""
    shp = flow_pl.shape[:1] + flow_pl.shape[2:]
    ys = lax.broadcasted_iota(jnp.int32, shp, 1).astype(jnp.float32)
    xs = lax.broadcasted_iota(jnp.int32, shp, 2).astype(jnp.float32)
    ix = jnp.clip(xs + flow_pl[:, 0].astype(jnp.float32), 0.0, W - 1)
    iy = jnp.clip(ys + flow_pl[:, 1].astype(jnp.float32), 0.0, H - 1)
    x0i = jnp.floor(ix).astype(jnp.int32)
    y0i = jnp.floor(iy).astype(jnp.int32)
    return _tile_scalars_v5_from_corners(y0i, x0i, HP, WP, win_w, tile_h,
                                         tile_w)


def _tile_scalars_v5_from_corners(y0i, x0i, HP, WP, win_w, tile_h,
                                  tile_w=TILE_W):

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
    # Weighted window rows are [0, nrows): source rows y_min..y_max plus
    # the +1 vertical tap, relative to ystart.  Almost every subtile has
    # a source span of ~8 rows (flows are smooth), i.e. nrows ~ 9-10 —
    # the kernel predicates its row chunks on this instead of running
    # whole 8-row pieces (16 row-gathers where ~10 carry weight).
    nrows = jnp.clip(y_max + 2 - ystart, 1, 3 * SUB_H)
    sc = jnp.stack([
        ystart.reshape(-1), wx.reshape(-1), nrows.reshape(-1),
        x_min.reshape(-1), x_max.reshape(-1),
    ]).astype(jnp.int32)

    # Program-level anchor: the window [32k, 32k + 3*32) must cover the
    # program's source rows [ty_min, ty_max+1].  The anchor must sit at
    # or below ty_min (subtile reads below the window clamp), and block
    # alignment can waste up to 31 rows below it, so a 2-block (64-row)
    # window guarantees only 33 usable rows above ty_min — measured as
    # systematic bottom-row escapes whenever ty_min lands just under a
    # block boundary.  Three 32-row blocks guarantee >= 65 rows above
    # ty_min: any tile whose source span fits 65 rows (tile_h=32 plus up
    # to 32 rows of in-tile flow variation) is covered exactly.
    # Second-stage reduce over the per-subtile mins (tiny array) instead
    # of a fifth full-resolution reduce_window: min over a (tile_h,
    # TILE_W) tile == min over that tile's (SUB_H, SUB_W) subtile mins.
    wdim = (1, tile_h // SUB_H, tile_w // SUB_W)
    ty_min = lax.reduce_window(y_min, jnp.int32(2**30), lax.min,
                               window_dimensions=wdim, window_strides=wdim,
                               padding="VALID")
    pstart = jnp.minimum(ty_min, HP - SUB_H)
    max_blk = max(HP // WIN_ROWS - 3, 0)
    rowblk = jnp.clip(pstart // WIN_ROWS, 0, max_blk)
    return sc, rowblk.reshape(-1).astype(jnp.int32)


def _warp_kernel_v5(sc_ref, rb_ref, imgA_ref, imgB_ref, imgC_ref, flow_ref,
                    *refs, H, W, HP, WP, win_w, cb, cg, nsh,
                    nsw, nth, ntw, tile_h, tile_w, skip, emit_grads=False):
    if emit_grads:
        out_ref, dx_ref, dy_ref, acc_ref, accx_ref, accy_ref = refs
    else:
        out_ref, acc_ref = refs
    g0 = pl.program_id(0)
    ti = pl.program_id(1)
    tj = pl.program_id(2)
    n = g0 // cg

    iota_s = lax.broadcasted_iota(jnp.int32, (SUB_H, SUB_W), 0)
    n_blk = win_w // SUB_W
    win_base = rb_ref[(n * nth + ti) * ntw + tj] * WIN_ROWS

    for s_i in range(tile_h // SUB_H):
        for s_j in range(tile_w // SUB_W):
            si = ti * (tile_h // SUB_H) + s_i
            sj = tj * (tile_w // SUB_W) + s_j
            flat = (n * nsh + si) * nsw + sj
            ystart = sc_ref[0, flat]
            wx = pl.multiple_of(sc_ref[1, flat], SUB_W)
            nr = sc_ref[2, flat]
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
                if emit_grads:
                    accx_ref[c] = jnp.zeros((SUB_H, SUB_W), jnp.float32)
                    accy_ref[c] = jnp.zeros((SUB_H, SUB_W), jnp.float32)

            def load8(row):
                """8 aligned rows [row, row+8) from the 96-row A|B|C
                window.  `row` is plane-absolute, 8-aligned, guaranteed
                >= win_base by the anchor construction; rows beyond the
                window clamp to its top."""
                rel = jnp.clip(row - win_base, 0, 3 * WIN_ROWS - SUB_H)
                in_a = rel < WIN_ROWS
                in_b = jnp.logical_and(rel >= WIN_ROWS, rel < 2 * WIN_ROWS)
                offA = pl.multiple_of(jnp.where(in_a, rel, 0), SUB_H)
                offB = pl.multiple_of(
                    jnp.where(in_b, rel - WIN_ROWS, 0), SUB_H)
                offC = pl.multiple_of(
                    jnp.where(jnp.logical_or(in_a, in_b), 0,
                              rel - 2 * WIN_ROWS), SUB_H)
                return in_a, in_b, offA, offB, offC

            def load_ch(c, sel, xsl):
                in_a, in_b, offA, offB, offC = sel
                return jnp.where(
                    in_a, imgA_ref[0, c, pl.ds(offA, SUB_H), xsl],
                    jnp.where(in_b,
                              imgB_ref[0, c, pl.ds(offB, SUB_H), xsl],
                              imgC_ref[0, c, pl.ds(offC, SUB_H), xsl]))

            def piece(m, s_lo, s_hi):
                """Accumulate window rows [8m+s_lo, 8m+s_hi)."""
                la = jnp.minimum(ya0 + SUB_H * m, HP - SUB_H)
                lb = jnp.minimum(ya0 + SUB_H * (m + 1), HP - SUB_H)
                sel_a = load8(la)
                sel_b = load8(lb)
                w_rows = {
                    s: jnp.maximum(0.0, 1.0 - jnp.abs(SUB_H * m + s - yrel))
                    for s in range(s_lo, s_hi)
                }
                if emit_grads:
                    # d w_row / d yrel as the two-sided indicator (+1 for
                    # rows in (yrel, yrel+1], -1 for (yrel-1, yrel]), so
                    # fy == 0 still yields d/dfy = v[y0+1] - v[y0].
                    def _dw(s, m=m):
                        delta = SUB_H * m + s - yrel
                        up = jnp.logical_and(delta > 0.0, delta <= 1.0)
                        dn = jnp.logical_and(delta > -1.0, delta <= 0.0)
                        return (up.astype(jnp.float32)
                                - dn.astype(jnp.float32))
                    dw_rows = {s: _dw(s) for s in range(s_lo, s_hi)}
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
                            a = load_ch(c, sel_a, xsl)
                            bch = load_ch(c, sel_b, xsl)
                            merged = jnp.where(
                                sel_y,
                                jnp.take_along_axis(a, idx_a, axis=0),
                                jnp.take_along_axis(bch, idx_b, axis=0))
                            acc = acc_ref[c]
                            if emit_grads:
                                accx = accx_ref[c]
                                accy = accy_ref[c]
                            for s in range(s_lo, s_hi):
                                src8 = jnp.broadcast_to(
                                    merged[s:s + 1, :], (SUB_H, SUB_W))
                                g = jnp.take_along_axis(src8, lane_off, axis=1)
                                u = lax.bitcast_convert_type(g, jnp.uint32)
                                v0 = lax.bitcast_convert_type(
                                    u << 16, jnp.float32)
                                v1 = lax.bitcast_convert_type(
                                    (u >> 16) << 16, jnp.float32)
                                blend = v0 * m0 + v1 * m1
                                acc = acc + blend * w_rows[s]
                                if emit_grads:
                                    accx = accx + (v1 - v0) * (m0 + m1) \
                                        * w_rows[s]
                                    accy = accy + blend * dw_rows[s]
                            acc_ref[c] = acc
                            if emit_grads:
                                accx_ref[c] = accx
                                accy_ref[c] = accy

            # Whole-piece predication on nr (= weighted rows [0, nr)).
            # A finer 2-row/6-row chunking of piece 1 was measured
            # SLOWER full-graph (62.9 vs 58.8 ms/iter, tools/r3_exp22):
            # each chunk re-does the window loads + row merges, and
            # in-model flows hit nr >= 11 often enough that the doubled
            # merge work beats the saved row-gathers.
            piece(0, 0, SUB_H)

            @pl.when(nr >= SUB_H + 1)
            def _p1():
                piece(1, 0, SUB_H)

            @pl.when(nr >= 2 * SUB_H + 1)
            def _p2():
                piece(2, 0, SUB_H)

            for c in range(cb):
                out_ref[(0, c) + osl] = acc_ref[c].astype(out_ref.dtype)
                if emit_grads:
                    dx_ref[(0, c) + osl] = accx_ref[c].astype(dx_ref.dtype)
                    dy_ref[(0, c) + osl] = accy_ref[c].astype(dy_ref.dtype)


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
    """Backward bilinear warp, v5 packed/windowed kernel (NHWC entry).

    img: (N, H, W, C) — any float dtype; taps are read at bf16 precision
    (the serving-path plane storage).  flow: (N, H, W, 2) pixel units.
    """
    out = warp_pallas_v5_pl(
        jnp.moveaxis(img, -1, 1), jnp.moveaxis(flow, -1, 1),
        win_w=win_w, interpret=interpret, skip=skip, tile_h=tile_h)
    return jnp.moveaxis(out, 1, -1).astype(img.dtype)


@functools.partial(jax.jit, static_argnames=("win_w", "interpret", "skip",
                                             "tile_h", "emit_grads",
                                             "tile_w_override"))
def warp_pallas_v5_pl(planes_in: jnp.ndarray, flow_pl: jnp.ndarray, *,
                      win_w: int = 256, interpret: bool = False,
                      skip: bool | None = None, tile_h: int = TILE_H,
                      emit_grads: bool = False,
                      tile_w_override: int | None = None):
    """Plane-native v5 warp: (N, C, H, W) x (N, 2, H, W) -> (N, C, H, W)
    bf16.  The plane-major inference glue calls this directly so no
    NHWC<->NCHW relayout (~0.8 ms each at 720p, tools/r3_exp8.py) ever
    enters the graph; scalar prep also runs on the dense planes.

    emit_grads: additionally return (dIdx, dIdy) — the per-pixel
    derivatives of the warped output w.r.t. the sampling coordinates
    (taps at bf16, same window contract) — so a training VJP needs no
    re-gathering: d_flow = sum_c g * dId{x,y}, d_img = the scatter.
    Returns (out, dIdx, dIdy) in that case."""
    n, c, h, w = planes_in.shape
    if not interpret and jax.default_backend() != "tpu":
        interpret = True

    hp = max(_ceil_to(h, tile_h), 3 * WIN_ROWS)
    # Program width: 2 lane-blocks when W divides 256; 1 for NARROW
    # tensors (<= 384) so levels like 320/160/80 wide don't pad 20-60%
    # of their output subtiles into the kernel grid.  Wider non-%256
    # tensors (e.g. 640) keep 2 blocks: the row-window DMA is
    # full-width per program, so halving tile_w there re-fetches the
    # same window 1.67x more and measures slower (the fast-mode graph's
    # 640-wide half-res warps went 54.8 -> 67.6 ms/iter before this
    # threshold).
    tile_w = TILE_W if (w % TILE_W == 0 or w > 384) else SUB_W
    if tile_w_override is not None:
        tile_w = tile_w_override
    wp = _ceil_to(w, tile_w)
    win_w = min(win_w, wp)

    # Window residency: 3 x WIN_ROWS x wp f32 per channel (+ out tiles).
    n_out = 3 if emit_grads else 1
    per_cb = 3 * WIN_ROWS * wp * 4 + n_out * tile_h * tile_w * 4
    cb = max(1, min(c, _VMEM_IMG_BUDGET // per_cb))
    while c % cb:
        cb -= 1
    cg = c // cb
    if skip is None:
        skip = True

    planes = planes_in.astype(jnp.bfloat16)
    flow_pl = flow_pl.astype(jnp.float32)
    if (hp, wp) != (h, w):
        planes = jnp.pad(planes, ((0, 0), (0, 0), (0, hp - h), (0, wp - w)))
        flow_pl = jnp.pad(flow_pl, ((0, 0), (0, 0), (0, hp - h), (0, wp - w)))
    packed = _pack_pairs(planes)

    scalars, rowblk = _tile_scalars_v5_pl(
        flow_pl, h, w, hp, wp, win_w, tile_h, tile_w)

    nth = hp // tile_h
    ntw = wp // tile_w
    grid = (n * cg, nth, ntw)
    kernel = functools.partial(
        _warp_kernel_v5, H=h, W=w, HP=hp, WP=wp, win_w=win_w, cb=cb, cg=cg,
        nsh=hp // SUB_H, nsw=wp // SUB_W, nth=nth, ntw=ntw, tile_h=tile_h,
        tile_w=tile_w, skip=skip, emit_grads=emit_grads)

    def win_index(g, i, j, sc, rb, *, cg=cg, nth=nth, ntw=ntw, delta=0):
        nn = g // cg
        return (nn, g % cg, rb[(nn * nth + i) * ntw + j] + delta, 0)

    out_spec = pl.BlockSpec(
        (1, cb, tile_h, tile_w),
        lambda g, i, j, sc, rb, cg=cg: (g // cg, g % cg, i, j),
        memory_space=pltpu.VMEM)
    out_sds = jax.ShapeDtypeStruct((n, c, hp, wp), jnp.bfloat16)
    acc_shape = pltpu.VMEM((cb, SUB_H, SUB_W), jnp.float32)

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
                pl.BlockSpec((1, cb, WIN_ROWS, wp),
                             functools.partial(win_index, delta=2),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2, tile_h, tile_w),
                             lambda g, i, j, sc, rb, cg=cg: (g // cg, 0, i, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[out_spec] * n_out if emit_grads else out_spec,
            scratch_shapes=[acc_shape] * n_out,
        ),
        out_shape=[out_sds] * 3 if emit_grads else out_sds,
        interpret=interpret,
    )(scalars, rowblk, packed, packed, packed, flow_pl)

    if emit_grads:
        return tuple(o[:, :, :h, :w] for o in out)
    return out[:, :, :h, :w]
