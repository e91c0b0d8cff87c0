"""Pallas warp kernel v4: exact-anchored merged row window.

v3 (warp.py) walks aligned 8-row source chunks around an 8-aligned
window anchor: a typical smooth-flow subtile needs 2-4 source rows but
straddles a chunk boundary, so v3 processes 16 rows with per-row mask
weights.  v4 assembles ONE merged 8-row chunk starting exactly at the
subtile's y_min with a sublane take_along_axis pair (dynamic roll), so
the common case processes 8 rows — with the closed-form bilinear row
weight  w(r) = max(0, 1 - |r - y_src|)  replacing v3's mask arithmetic.
A second merged piece (guarded, rare) extends coverage to 16 rows;
beyond that coordinates clamp (escape semantics as v3).

The x dimension keeps v3's aligned-block walk (blocks guarded by the
per-subtile extents): an exact x anchor would not help — the x-span is
always > 128 lanes whenever flow varies at all, so an "extension block"
would run every time, while the aligned walk already touches only the
1-2 blocks that matter (waste appears only in the rare 127-lane
alignment-escape corner documented in warp.py).
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


def _tile_scalars_v4(flow, H, W, HP, WP, win_w):
    """[ystart, wx, y2, x_lo, x_hi] per (8,128) output subtile."""
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

    ystart = jnp.minimum(y_min, HP - SUB_H)
    wx = jnp.clip((x_min // SUB_W) * SUB_W, 0, max(WP - win_w, 0))
    # extra merged row pieces needed beyond the first (0, 1 or 2)
    y2 = ((y_max + 1 >= ystart + SUB_H).astype(jnp.int32)
          + (y_max + 1 >= ystart + 2 * SUB_H).astype(jnp.int32))
    return jnp.stack([
        ystart.reshape(-1), wx.reshape(-1), y2.reshape(-1),
        x_min.reshape(-1), x_max.reshape(-1),
    ]).astype(jnp.int32)


def _warp_kernel_v4(sc_ref, img_ref, flow_ref, out_ref, acc_ref,
                    *, H, W, HP, WP, win_w, cb, cg, nsh, nsw, tile_h=TILE_H,
                    skip=True):
    g0 = pl.program_id(0)
    ti = pl.program_id(1)
    tj = pl.program_id(2)
    n = g0 // cg

    iota_s = lax.broadcasted_iota(jnp.int32, (SUB_H, SUB_W), 0)
    n_blk = win_w // SUB_W

    for s_i in range(tile_h // SUB_H):
        for s_j in range(TILE_W // SUB_W):
            si = ti * (tile_h // SUB_H) + s_i
            sj = tj * (TILE_W // SUB_W) + s_j
            flat = (n * nsh + si) * nsw + sj
            ystart = sc_ref[0, flat]
            wx = pl.multiple_of(sc_ref[1, flat], SUB_W)
            y2 = sc_ref[2, flat]
            x_lo = sc_ref[3, flat]
            x_hi = sc_ref[4, flat] + 1

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

            # Float row position relative to the merged window; escapes
            # clamp to the covered 16 rows (samples the edge row).
            yrel = jnp.clip(iy - ystart.astype(jnp.float32),
                            0.0, 3.0 * SUB_H - 1.0)
            rx = jnp.clip(x0.astype(jnp.int32) - wx, 0, win_w - 1)
            fx = jnp.where(rx == win_w - 1, 0.0, fx)

            lane_blk = rx // SUB_W
            lane_off = rx % SUB_W
            lane_off1 = lane_off + 1
            carry = lane_off1 == SUB_W
            lane_blk1 = lane_blk + carry.astype(jnp.int32)
            lane_off1 = jnp.where(carry, 0, lane_off1)

            ya0 = pl.multiple_of((ystart // SUB_H) * SUB_H, SUB_H)
            ky = ystart - ya0
            idx_a = jnp.clip(ky + iota_s, 0, SUB_H - 1)
            idx_b = jnp.clip(ky + iota_s - SUB_H, 0, SUB_H - 1)
            sel_y = (ky + iota_s) <= (SUB_H - 1)

            osl = (slice(s_i * SUB_H, (s_i + 1) * SUB_H),
                   slice(s_j * SUB_W, (s_j + 1) * SUB_W))
            for c in range(cb):
                acc_ref[c] = jnp.zeros((SUB_H, SUB_W), jnp.float32)

            def piece(m):
                """Merged rows [ystart + 8m, +8) x the aligned block walk."""
                # both operands are multiples of SUB_H, so the min is too
                la = pl.multiple_of(
                    jnp.minimum(ya0 + SUB_H * m, HP - SUB_H), SUB_H)
                lb = pl.multiple_of(
                    jnp.minimum(ya0 + SUB_H * (m + 1), HP - SUB_H), SUB_H)
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
                        m1 = jnp.where(lane_blk1 == b, fx, 0.0)
                        for c in range(cb):
                            a = img_ref[0, c, pl.ds(la, SUB_H),
                                        pl.ds(wx + b * SUB_W, SUB_W)].astype(jnp.float32)
                            bch = img_ref[0, c, pl.ds(lb, SUB_H),
                                          pl.ds(wx + b * SUB_W, SUB_W)].astype(jnp.float32)
                            merged = jnp.where(
                                sel_y,
                                jnp.take_along_axis(a, idx_a, axis=0),
                                jnp.take_along_axis(bch, idx_b, axis=0))
                            acc = acc_ref[c]
                            for s in range(SUB_H):
                                src8 = jnp.broadcast_to(
                                    merged[s:s + 1, :], (SUB_H, SUB_W))
                                gv0 = jnp.take_along_axis(src8, lane_off, axis=1)
                                gv1 = jnp.take_along_axis(src8, lane_off1, axis=1)
                                acc = acc + (gv0 * m0 + gv1 * m1) * w_rows[s]
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


@functools.partial(jax.jit, static_argnames=("win_w", "interpret", "skip", "tile_h"))
def warp_pallas_v4(img: jnp.ndarray, flow: jnp.ndarray, *, win_w: int = 256,
                   interpret: bool = False,
                   skip: bool | None = None, tile_h: int = TILE_H) -> jnp.ndarray:
    """Backward bilinear warp, v4 merged-row kernel.

    img: (N, H, W, C); flow: (N, H, W, 2) pixel units.  Exact vs
    warp_xla when each (8,128) output subtile's source spread fits
    24 rows x (win_w minus x-alignment waste) lanes; escapes clamp.
    (Row pieces 2 and 3 are guarded — smooth flows use one.)
    """
    n, h, w, c = img.shape
    out_dtype = img.dtype
    if not interpret and jax.default_backend() != "tpu":
        interpret = True

    hp = _ceil_to(h, tile_h)
    wp = _ceil_to(w, TILE_W)
    win_w = min(win_w, wp)

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
    flow_pl = jnp.moveaxis(flow, -1, 1).astype(jnp.float32)
    if (hp, wp) != (h, w):
        planes = jnp.pad(planes, ((0, 0), (0, 0), (0, hp - h), (0, wp - w)))
        flow_pl = jnp.pad(flow_pl, ((0, 0), (0, 0), (0, hp - h), (0, wp - w)))

    scalars = _tile_scalars_v4(
        jnp.moveaxis(flow_pl, 1, -1), h, w, hp, wp, win_w)

    grid = (n * cg, hp // tile_h, wp // TILE_W)
    kernel = functools.partial(_warp_kernel_v4, H=h, W=w, HP=hp, WP=wp,
                               win_w=win_w, cb=cb, cg=cg, tile_h=tile_h,
                               nsh=hp // SUB_H, nsw=wp // SUB_W, skip=skip)

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
        out_shape=jax.ShapeDtypeStruct((n, c, hp, wp), plane_dt),
        interpret=interpret,
    )(scalars, planes, flow_pl)

    out = out[:, :, :h, :w]
    return jnp.moveaxis(out, 1, -1).astype(out_dtype)
