"""Fused pair-warp + sigmoid-mask blend epilogue (Pallas, v5 core).

The final IFNet level warps the full-res image pair and immediately
blends it: ``merged = w0*sig(m) + w1*(1-sig(m))`` (reference
model/IFNet.py:82,99; v4.25 analog train_log/IFNet_HDv3.py:163-168).
As two batch-concatenated v5 programs plus an XLA blend, w0/w1 make a
full HBM round trip and the blend is its own kernel launch.  Here ONE
program warps both images of a pair (two 96-row windows resident, two
scalar sets) and emits the blended frame directly from the output
stage; the separate w0/w1 planes are optionally co-emitted for
consumers that still need them (the paper model's 17ch U-Net concat).

Per-pair this halves the program count of the final-level warp, drops
the blend launch, and (for blend-only consumers like v4.25 fastmode)
halves the warp's output writes.

Window/precision contract: identical to warp_v5 (bf16 taps, 96-row
windows, packed x-taps); the blend rounds each warp result to bf16
first, then combines with the bf16-rounded sigmoid in f32 — the same
value chain as the unfused v5 + XLA blend up to one bf16 rounding of
the product sum.
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
    _VMEM_IMG_BUDGET,
)
from rife_tpu.ops.pallas.warp_v5 import (
    WIN_ROWS,
    _pack_pairs,
    _tile_scalars_v5_pl,
)


def _warp_blend_kernel(sc_ref, rb_ref, a0_ref, b0_ref, c0_ref, a1_ref,
                       b1_ref, c1_ref, flow_ref, mask_ref, *refs,
                       H, W, HP, WP, win_w, cb, cg, nsh, nsw, nth, ntw,
                       tile_h, tile_w, nprog, skip, emit_pair):
    if emit_pair:
        blend_ref, w0_ref, w1_ref, acc0_ref, acc1_ref = refs
        pair_refs = (w0_ref, w1_ref)
    else:
        blend_ref, acc0_ref, acc1_ref = refs
        pair_refs = (None, None)
    g0 = pl.program_id(0)
    ti = pl.program_id(1)
    tj = pl.program_id(2)
    n = g0 // cg

    iota_s = lax.broadcasted_iota(jnp.int32, (SUB_H, SUB_W), 0)
    n_blk = win_w // SUB_W
    prog = (n * nth + ti) * ntw + tj
    win_bases = (rb_ref[prog] * WIN_ROWS, rb_ref[nprog + prog] * WIN_ROWS)
    windows = ((a0_ref, b0_ref, c0_ref), (a1_ref, b1_ref, c1_ref))
    accs = (acc0_ref, acc1_ref)

    for s_i in range(tile_h // SUB_H):
        for s_j in range(tile_w // SUB_W):
            si = ti * (tile_h // SUB_H) + s_i
            sj = tj * (tile_w // SUB_W) + s_j
            flat = (n * nsh + si) * nsw + sj
            rsl = slice(s_i * SUB_H, (s_i + 1) * SUB_H)
            csl = slice(s_j * SUB_W, (s_j + 1) * SUB_W)
            ys = (iota_s + si * SUB_H).astype(jnp.float32)
            xs = (lax.broadcasted_iota(jnp.int32, (SUB_H, SUB_W), 1)
                  + sj * SUB_W).astype(jnp.float32)
            osl = (slice(s_i * SUB_H, (s_i + 1) * SUB_H),
                   slice(s_j * SUB_W, (s_j + 1) * SUB_W))

            # unrolled over the two images of the pair (k = 0, 1)
            for k in range(2):
                acc_ref = accs[k]
                imgA_ref, imgB_ref, imgC_ref = windows[k]
                win_base = win_bases[k]
                ystart = sc_ref[5 * k + 0, flat]
                wx = pl.multiple_of(sc_ref[5 * k + 1, flat], SUB_W)
                nr = sc_ref[5 * k + 2, flat]
                x_lo = sc_ref[5 * k + 3, flat]
                x_hi = sc_ref[5 * k + 4, flat]

                fdx = flow_ref[0, 2 * k, rsl, csl]
                fdy = flow_ref[0, 2 * k + 1, rsl, csl]
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

                for c in range(cb):
                    acc_ref[c] = jnp.zeros((SUB_H, SUB_W), jnp.float32)

                def load8(row, win_base=win_base):
                    rel = jnp.clip(row - win_base, 0, 3 * WIN_ROWS - SUB_H)
                    in_a = rel < WIN_ROWS
                    in_b = jnp.logical_and(rel >= WIN_ROWS,
                                           rel < 2 * WIN_ROWS)
                    offA = pl.multiple_of(jnp.where(in_a, rel, 0), SUB_H)
                    offB = pl.multiple_of(
                        jnp.where(in_b, rel - WIN_ROWS, 0), SUB_H)
                    offC = pl.multiple_of(
                        jnp.where(jnp.logical_or(in_a, in_b), 0,
                                  rel - 2 * WIN_ROWS), SUB_H)
                    return in_a, in_b, offA, offB, offC

                def load_ch(c, sel, xsl, imgA_ref=imgA_ref,
                            imgB_ref=imgB_ref, imgC_ref=imgC_ref):
                    in_a, in_b, offA, offB, offC = sel
                    return jnp.where(
                        in_a, imgA_ref[0, c, pl.ds(offA, SUB_H), xsl],
                        jnp.where(in_b,
                                  imgB_ref[0, c, pl.ds(offB, SUB_H), xsl],
                                  imgC_ref[0, c, pl.ds(offC, SUB_H), xsl]))

                def piece(m, ya0=ya0, yrel=yrel, wx=wx, x_lo=x_lo,
                          x_hi=x_hi, lane_blk=lane_blk, lane_off=lane_off,
                          fx=fx, idx_a=idx_a, idx_b=idx_b, sel_y=sel_y,
                          acc_ref=acc_ref, load8=load8, load_ch=load_ch):
                    la = jnp.minimum(ya0 + SUB_H * m, HP - SUB_H)
                    lb = jnp.minimum(ya0 + SUB_H * (m + 1), HP - SUB_H)
                    sel_a = load8(la)
                    sel_b = load8(lb)
                    w_rows = {
                        s: jnp.maximum(
                            0.0, 1.0 - jnp.abs(SUB_H * m + s - yrel))
                        for s in range(SUB_H)
                    }
                    for b in range(n_blk):
                        blk_on = jnp.logical_and(
                            wx + b * SUB_W <= x_hi,
                            wx + (b + 1) * SUB_W - 1 >= x_lo)
                        if not skip:
                            blk_on = jnp.bool_(True)

                        @pl.when(blk_on)
                        def _blk(b=b, sel_a=sel_a, sel_b=sel_b,
                                 w_rows=w_rows):
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
                                for s in range(SUB_H):
                                    src8 = jnp.broadcast_to(
                                        merged[s:s + 1, :], (SUB_H, SUB_W))
                                    g = jnp.take_along_axis(src8, lane_off,
                                                            axis=1)
                                    u = lax.bitcast_convert_type(g,
                                                                 jnp.uint32)
                                    v0 = lax.bitcast_convert_type(
                                        u << 16, jnp.float32)
                                    v1 = lax.bitcast_convert_type(
                                        (u >> 16) << 16, jnp.float32)
                                    acc = acc + (v0 * m0 + v1 * m1) \
                                        * w_rows[s]
                                acc_ref[c] = acc

                piece(0)

                @pl.when(nr >= SUB_H + 1)
                def _p1(piece=piece):
                    piece(1)

                @pl.when(nr >= 2 * SUB_H + 1)
                def _p2(piece=piece):
                    piece(2)

            # ---- fused epilogue: blend with the sigmoid mask ----------
            # same value chain as the unfused path: round each warp to
            # bf16, sigmoid rounded to bf16, products combined in f32.
            m = mask_ref[0, 0, rsl, csl].astype(jnp.float32)
            sig = jax.nn.sigmoid(m).astype(jnp.bfloat16).astype(jnp.float32)
            for c in range(cb):
                w0b = acc0_ref[c].astype(jnp.bfloat16)
                w1b = acc1_ref[c].astype(jnp.bfloat16)
                blend = (w0b.astype(jnp.float32) * sig
                         + w1b.astype(jnp.float32) * (1.0 - sig))
                blend_ref[(0, c) + osl] = blend.astype(blend_ref.dtype)
                if emit_pair:
                    pair_refs[0][(0, c) + osl] = w0b.astype(w0_ref.dtype)
                    pair_refs[1][(0, c) + osl] = w1b.astype(w1_ref.dtype)


@functools.partial(jax.jit, static_argnames=("win_w", "interpret", "skip",
                                             "tile_h", "emit_pair"))
def warp_pair_blend_pl(img0_pl: jnp.ndarray, img1_pl: jnp.ndarray,
                       flow_pl: jnp.ndarray, mask_pl: jnp.ndarray, *,
                       emit_pair: bool = True, win_w: int = 256,
                       interpret: bool = False, skip: bool | None = None,
                       tile_h: int = TILE_H):
    """(N,C,H,W) x2, (N,4,H,W) flow, (N,1,H,W) pre-sigmoid mask ->
    blend (N,C,H,W) bf16 [, w0, w1 if emit_pair].

    blend = bf16(warp(img0, flow[:, :2])) * bf16(sig(mask))
          + bf16(warp(img1, flow[:, 2:4])) * (1 - bf16(sig(mask)))
    """
    n, c, h, w = img0_pl.shape
    assert img1_pl.shape == img0_pl.shape
    assert flow_pl.shape == (n, 4, h, w), flow_pl.shape
    assert mask_pl.shape == (n, 1, h, w), mask_pl.shape
    if not interpret and jax.default_backend() != "tpu":
        interpret = True

    hp = max(_ceil_to(h, tile_h), 3 * WIN_ROWS)
    # narrow-tensor program width, same threshold as warp_v5
    tile_w = TILE_W if (w % TILE_W == 0 or w > 384) else SUB_W
    wp = _ceil_to(w, tile_w)
    win_w = min(win_w, wp)

    n_out = 3 if emit_pair else 1
    # two images' windows resident per program
    per_cb = 2 * (3 * WIN_ROWS * wp * 4) + n_out * tile_h * tile_w * 4
    cb = max(1, min(c, _VMEM_IMG_BUDGET // per_cb))
    while c % cb:
        cb -= 1
    cg = c // cb
    if skip is None:
        skip = True

    def prep(planes):
        planes = planes.astype(jnp.bfloat16)
        if (hp, wp) != (h, w):
            planes = jnp.pad(planes,
                             ((0, 0), (0, 0), (0, hp - h), (0, wp - w)))
        return _pack_pairs(planes)

    packed0 = prep(img0_pl)
    packed1 = prep(img1_pl)
    flow_pl = flow_pl.astype(jnp.float32)
    mask_pl = mask_pl.astype(jnp.float32)
    if (hp, wp) != (h, w):
        flow_pl = jnp.pad(flow_pl,
                          ((0, 0), (0, 0), (0, hp - h), (0, wp - w)))
        mask_pl = jnp.pad(mask_pl,
                          ((0, 0), (0, 0), (0, hp - h), (0, wp - w)))

    sc0, rb0 = _tile_scalars_v5_pl(flow_pl[:, 0:2], h, w, hp, wp, win_w,
                                   tile_h, tile_w)
    sc1, rb1 = _tile_scalars_v5_pl(flow_pl[:, 2:4], h, w, hp, wp, win_w,
                                   tile_h, tile_w)
    scalars = jnp.concatenate([sc0, sc1], axis=0)  # (10, nsub)
    rowblk = jnp.concatenate([rb0, rb1], axis=0)   # (2 * nprog,)

    nth = hp // tile_h
    ntw = wp // tile_w
    nprog = n * nth * ntw
    grid = (n * cg, nth, ntw)
    kernel = functools.partial(
        _warp_blend_kernel, H=h, W=w, HP=hp, WP=wp, win_w=win_w, cb=cb,
        cg=cg, nsh=hp // SUB_H, nsw=wp // SUB_W, nth=nth, ntw=ntw,
        tile_h=tile_h, tile_w=tile_w, nprog=nprog, skip=skip,
        emit_pair=emit_pair)

    def win_index(g, i, j, sc, rb, *, base, delta):
        nn = g // cg
        return (nn, g % cg, rb[base + (nn * nth + i) * ntw + j] + delta, 0)

    def win_spec(base, delta):
        return pl.BlockSpec(
            (1, cb, WIN_ROWS, wp),
            functools.partial(win_index, base=base, delta=delta),
            memory_space=pltpu.VMEM)

    out_spec = pl.BlockSpec(
        (1, cb, tile_h, tile_w),
        lambda g, i, j, sc, rb: (g // cg, g % cg, i, j),
        memory_space=pltpu.VMEM)
    out_sds = jax.ShapeDtypeStruct((n, c, hp, wp), jnp.bfloat16)
    acc_shape = pltpu.VMEM((cb, SUB_H, SUB_W), jnp.float32)

    plane_spec = lambda ch: pl.BlockSpec(
        (1, ch, tile_h, tile_w),
        lambda g, i, j, sc, rb: (g // cg, 0, i, j),
        memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                win_spec(0, 0), win_spec(0, 1), win_spec(0, 2),
                win_spec(nprog, 0), win_spec(nprog, 1), win_spec(nprog, 2),
                plane_spec(4),   # flow (both directions)
                plane_spec(1),   # pre-sigmoid mask
            ],
            out_specs=[out_spec] * n_out if emit_pair else out_spec,
            scratch_shapes=[acc_shape, acc_shape],
        ),
        out_shape=[out_sds] * n_out if emit_pair else out_sds,
        interpret=interpret,
    )(scalars, rowblk, packed0, packed0, packed0, packed1, packed1,
      packed1, flow_pl, mask_pl)

    if emit_pair:
        return tuple(o[:, :, :h, :w] for o in out)
    return out[:, :, :h, :w]
