"""exp50: VMEM-resident fused conv+PReLU chain (the SURVEY north-star kernel).

The one conv lowering family round 3 never measured: a single Pallas
kernel that keeps a whole convblock's activation resident in VMEM and
runs all 8 (3x3 conv + PReLU) stages + the residual add without ever
touching HBM between stages.  XLA's chain runs at 56-64 TF/s (~30% MFU,
docs/PERFORMANCE.md) and re-materializes the activation to HBM between
convs; at block0 shape the activation is only ~1.9 MB/batch-item so the
whole chain fits VMEM (~16 MB/core) with single-buffering.

Formulation: flattened-taps conv-as-matmul.  The padded (H+2, W+2, C)
activation is stored as a flat (Mp=(H+2)*(W+2), C) matrix in a VMEM
scratch with a (Wp+1)-row zero guard on both ends; each of the 9 taps of
a SAME 3x3 conv is then a *static* row-offset slice, so one conv is

    acc = sum_t  X[G+off_t : G+off_t+Mp, :] @ W_t   (+ bias)
    y   = PReLU(acc) * interior_mask                 (border rows -> 0)

and y writes back over the scratch interior for the next stage.  Border
positions of the padded grid double as the next conv's zero padding, so
masking them to zero each stage reproduces Conv2d(padding=1) exactly.
Wrapped taps (row ends) land on those zeroed border columns or in the
guard, contributing nothing.  Grid = (N, 8 convs), sequential, with the
per-conv weights streamed via the BlockSpec index_map (1.04 MB/step at
C=240) while the activation never leaves VMEM.

Scope: block0 core shape only (b4 46x80 c240).  block1/2 activations
(4.6/10.8 MB + f32 accumulator) exceed single-buffer VMEM and would
need chunked accumulation with ping-pong buffers — worth building only
if this measures a clear win at block0.

Run on CPU for interpret-mode parity, on the chip for timings.
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rife_tpu.nn import conv_prelu, conv_prelu_params


# ----------------------------------------------------------------- XLA ref
def xla_core(x, params):
    y = x
    for cp in params:
        y = conv_prelu(y, cp)
    return y + x


# -------------------------------------------------------------- Pallas
def _kernel(x_ref, w_ref, b_ref, a_ref, m_ref, o_ref, B, *, Mp, G, nconv):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        B[pl.ds(0, G), :] = jnp.zeros((G, B.shape[1]), B.dtype)
        B[pl.ds(G + Mp, G), :] = jnp.zeros((G, B.shape[1]), B.dtype)
        B[pl.ds(G, Mp), :] = x_ref[0]

    w = w_ref[0]      # (9, C, C)
    mask = m_ref[...]  # (Mp, C) bf16 interior mask
    acc = jnp.broadcast_to(b_ref[0].astype(jnp.float32), (Mp, w.shape[1]))
    for t in range(9):
        acc = acc + jnp.dot(B[pl.ds(G + _kernel.offs[t], Mp), :], w[t],
                            preferred_element_type=jnp.float32)
    y = jnp.where(acc >= 0, acc, acc * a_ref[0].astype(jnp.float32))
    y = y.astype(B.dtype) * mask
    B[pl.ds(G, Mp), :] = y

    @pl.when(j == nconv - 1)
    def _emit():
        o_ref[0] = y + x_ref[0]


def pallas_core(x, params, *, interpret=False):
    """x: (N, H, W, C) NHWC.  params: list of 8 conv_prelu param dicts."""
    n, h, w_, c = x.shape
    hp, wp = h + 2, w_ + 2
    mp = hp * wp
    g = ((wp + 1 + 7) // 8) * 8  # guard rows, 8-aligned for tidy tiles
    nconv = len(params)
    dt = x.dtype

    offs = [(dy - 1) * wp + (dx - 1) for dy in range(3) for dx in range(3)]
    _kernel.offs = offs

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0))).reshape(n, mp, c)
    wk = jnp.stack([p["conv"]["w"].reshape(9, c, c).astype(dt) for p in params])
    bk = jnp.stack([p["conv"]["b"].reshape(1, c).astype(jnp.float32) for p in params])
    ak = jnp.stack([p["alpha"].reshape(1, c).astype(jnp.float32) for p in params])
    im = jnp.zeros((hp, wp, c), dt).at[1:-1, 1:-1, :].set(1.0).reshape(mp, c)

    kern = functools.partial(_kernel, Mp=mp, G=g, nconv=nconv)
    out = pl.pallas_call(
        kern,
        grid=(n, nconv),
        in_specs=[
            pl.BlockSpec((1, mp, c), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 9, c, c), lambda i, j: (j, 0, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda i, j: (j, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda i, j: (j, 0, 0)),
            pl.BlockSpec((mp, c), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, mp, c), lambda i, j: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, mp, c), dt),
        scratch_shapes=[pltpu.VMEM((g + mp + g, c), dt)],
        interpret=interpret,
    )(xp, wk, bk, ak, im)
    return out.reshape(n, hp, wp, c)[:, 1:-1, 1:-1, :]


# ------------------------------------------- Pallas v2: K-concat matmul
# Hypothesis: v1's 9 per-tap dots round-trip the f32 accumulator through
# VMEM 8 extra times per conv.  v2 lane-concatenates the 9 tap slices
# per row-chunk into (R, 9*Cp) and does ONE K=9*Cp matmul, moving the
# accumulation into the MXU's K-loop.  Channels are padded to Cp=256 so
# every lane-concat offset is 128-aligned; ping-pong buffers because
# chunked in-place writes would corrupt later chunks' taps.
def _kernel2b(x_ref, w_ref, b_ref, a_ref, m_ref, o_ref, Ba, Bb, *,
              Mp, G, nconv, R):
    j = pl.program_id(1)
    cp = Ba.shape[1]

    @pl.when(j == 0)
    def _init():
        for B in (Ba, Bb):
            B[pl.ds(0, G), :] = jnp.zeros((G, cp), B.dtype)
            B[pl.ds(G + Mp, G), :] = jnp.zeros((G, cp), B.dtype)
        Ba[pl.ds(G, Mp), :] = x_ref[0]

    def step(src, dst):
        for r0 in range(0, Mp, R):
            xcat = jnp.concatenate(
                [src[pl.ds(G + off + r0, R), :] for off in _kernel2b.offs], 1)
            acc = jnp.dot(xcat, w_ref[0], preferred_element_type=jnp.float32)
            acc = acc + b_ref[0].astype(jnp.float32)
            y = jnp.where(acc >= 0, acc, acc * a_ref[0].astype(jnp.float32))
            y = y.astype(dst.dtype) * m_ref[pl.ds(r0, R), :]
            dst[pl.ds(G + r0, R), :] = y

            @pl.when(j == nconv - 1)
            def _emit():
                o_ref[0, pl.ds(r0, R), :] = y + x_ref[0, pl.ds(r0, R), :]

    @pl.when(j % 2 == 0)
    def _even():
        step(Ba, Bb)

    @pl.when(j % 2 == 1)
    def _odd():
        step(Bb, Ba)


def pallas_core_v2(x, params, *, interpret=False, chunk=492):
    n, h, w_, c = x.shape
    hp, wp = h + 2, w_ + 2
    mp = hp * wp
    g = ((wp + 1 + 7) // 8) * 8
    nconv = len(params)
    dt = x.dtype
    cp = ((c + 255) // 256) * 256  # lane-aligned channel pad
    # exact row-chunk tiling: largest multiple of 8 that divides mp
    chunk = (chunk // 8) * 8
    while chunk > 0 and mp % chunk:
        chunk -= 8
    assert chunk > 0, f"mp={mp} has no 8-multiple divisor <= requested chunk"
    _kernel2b.offs = [(dy - 1) * wp + (dx - 1)
                      for dy in range(3) for dx in range(3)]

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, cp - c))).reshape(n, mp, cp)
    wcat = jnp.stack([
        jnp.pad(p["conv"]["w"].astype(dt), ((0, 0), (0, 0), (0, cp - c),
                                            (0, cp - c)))
        .reshape(9 * cp, cp)
        for p in params])
    bk = jnp.stack([jnp.pad(p["conv"]["b"].astype(jnp.float32), (0, cp - c))
                    .reshape(1, cp) for p in params])
    ak = jnp.stack([jnp.pad(p["alpha"].astype(jnp.float32), (0, cp - c))
                    .reshape(1, cp) for p in params])
    im = jnp.zeros((hp, wp, cp), dt).at[1:-1, 1:-1, :].set(1.0).reshape(mp, cp)

    kern = functools.partial(_kernel2b, Mp=mp, G=g, nconv=nconv, R=chunk)
    out = pl.pallas_call(
        kern,
        grid=(n, nconv),
        in_specs=[
            pl.BlockSpec((1, mp, cp), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 9 * cp, cp), lambda i, j: (j, 0, 0)),
            pl.BlockSpec((1, 1, cp), lambda i, j: (j, 0, 0)),
            pl.BlockSpec((1, 1, cp), lambda i, j: (j, 0, 0)),
            pl.BlockSpec((mp, cp), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, mp, cp), lambda i, j: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, mp, cp), dt),
        scratch_shapes=[pltpu.VMEM((g + mp + g, cp), dt),
                        pltpu.VMEM((g + mp + g, cp), dt)],
        interpret=interpret,
    )(xp, wcat, bk, ak, im)
    return out.reshape(n, hp, wp, cp)[:, 1:-1, 1:-1, :c]


# ------------------------------------------------------------- harness
def main():
    backend = jax.default_backend()
    interp = backend != "tpu"
    # Parity at a tiny shape (interpret-mode graphs explode on CPU,
    # CLAUDE.md); nconv=3 still exercises init/chain/emit + residual.
    N, H, W, C = (2, 14, 16, 32) if interp else (4, 46, 80, 240)
    nconv = 3 if interp else 8
    dt = jnp.bfloat16
    ks = jax.random.split(jax.random.PRNGKey(0), 9)
    params = [conv_prelu_params(ks[i % 8], 3, 3, C, C) for i in range(nconv)]
    x = (jax.random.uniform(ks[8], (N, H, W, C), jnp.float32) - 0.3).astype(dt)

    ref = np.asarray(jax.jit(xla_core)(x, params), np.float32)
    scale = np.abs(ref).mean() + 1e-6
    for name, impl in [("v1", pallas_core), ("v2", pallas_core_v2)]:
        got = np.asarray(impl(x, params, interpret=interp), np.float32)
        err = np.abs(ref - got)
        ok = err.mean() / scale < 2e-2  # bf16 chain, different accum order
        print(f"[{backend}] {name} parity: max abs {err.max():.4f}  mean rel "
              f"{err.mean() / scale:.5f}  ->", "OK" if ok else "FAIL")
    if backend != "tpu":
        return

    iters = 50
    for name, fn in [("xla", lambda a: xla_core(a, params)),
                     ("pallas_v1", lambda a: pallas_core(a, params)),
                     ("pallas_v2", lambda a: pallas_core_v2(a, params))]:
        @jax.jit
        def chained(a):
            def body(i, a):
                y = fn(a)
                return (y * 1e-3).astype(a.dtype)  # keep magnitudes bounded
            return jnp.mean(lax.fori_loop(0, iters, body, a).astype(jnp.float32))

        float(chained(x))
        best = min(
            (lambda t0: (float(chained(x)), time.perf_counter() - t0)[1])(
                time.perf_counter())
            for _ in range(3))
        gmac = N * H * W * C * C * 9 * 8 / 1e9
        print(f"{name}: {best / iters * 1e3:.3f} ms/chain  "
              f"{gmac * 2 / (best / iters) / 1e3:.1f} TF/s")


if __name__ == "__main__":
    main()
