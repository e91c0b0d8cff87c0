"""H-tiled conv rewrites for large-spatial TPU convs.

Measured on v5e (tools/profile_stem*.py, profile_tiled_all.py): XLA's
conv lowering falls 20x+ off roofline when a conv's spatial extent is
large (e.g. 17ch 3x3/s2 at 1280x736: 5.35 ms for ~13 GFLOP — vs 0.52 ms
for the identical conv with H folded into the batch dimension).  The
rewrite reshapes H into batch tiles of T output rows with 1-row halos
built by one concat (an exact transformation — maxdiff 0 vs the plain
conv), and pays off only above ~200k input pixels:

| shape                          | plain | tiled |
|--------------------------------|-------|-------|
| 17->45  3x3/s2 @1280x736       | 5.35  | 1.89  |
| 32->32  3x3/s1 @640x368        | 1.92  | 0.41  |
| 16->3   3x3/s1 @1280x736       | 3.20  | 1.25  |
| 64->16  deconv4/s2 @640x368    | 3.86  | 1.64  |
| 90->90  3x3/s1 @320x184        | 0.57  | 0.79 (worse - don't tile) |

Dispatch lives in rife_tpu.nn.layers; these functions are exact
drop-ins for 3x3 pad-1 convs (stride 1 or 2) and k4/s2/pad-1
transposed convs.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax

_DN = ("NHWC", "HWIO", "NHWC")

# Input-pixel threshold above which tiling wins (measured crossover
# between 1/4-res 59k px: slower, and 1/2-res 235k px: 2-5x faster).
MIN_PIXELS = 200_000
TILE_ROWS = 16


def conv2d_tiled(x: jnp.ndarray, w: jnp.ndarray, stride: int, precision,
                 T: int | None = None) -> jnp.ndarray:
    """3x3 pad-1 stride-{1,2} conv with H folded into batch (exact)."""
    T = T or TILE_ROWS
    n, h, wd, c = x.shape
    s = stride
    Ti = T * s
    nt = -(-h // Ti)
    hp = nt * Ti
    if hp != h:
        x = jnp.pad(x, ((0, 0), (0, hp - h), (0, 0), (0, 0)))
    mid = x.reshape(n, nt, Ti, wd, c)
    top = jnp.pad(mid[:, :-1, Ti - 1:], ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0)))
    parts = [top, mid]
    if s == 1:
        bot = jnp.pad(mid[:, 1:, :1], ((0, 0), (0, 1), (0, 0), (0, 0), (0, 0)))
        parts.append(bot)
    tiles = jnp.concatenate(parts, axis=2).reshape(n * nt, -1, wd, c)
    y = lax.conv_general_dilated(
        tiles, w, (s, s), ((0, 0), (1, 1)),
        dimension_numbers=_DN,
        precision=precision,
        preferred_element_type=x.dtype,
    ).astype(x.dtype)
    y = y.reshape(n, nt * T, -1, w.shape[-1])
    return y[:, :h // s]


def conv2d_tiled_hstack(x: jnp.ndarray, w: jnp.ndarray, stride: int,
                        precision, T: int | None = None) -> jnp.ndarray:
    """conv2d_tiled variant that stacks the halo'd tiles along H instead
    of folding them into batch (exact; r5 copy-category experiment,
    VERDICT r4 next #6).  MEASURED NEGATIVE: 89.8 vs 57.6 ms/iter
    full-graph (docs/PERFORMANCE.md round-5 negatives) — kept as the
    recorded negative's harness, not a serving path.

    Rationale: the trace's 12.8 ms/iter layout-copy category is XLA
    relayouting each (n*nt, rows, W, C) tile batch into the conv's
    preferred batch-minor layout (~0.61 ms per copy at ~410 GB/s,
    docs/PERFORMANCE.md "TRUE budget").  Keeping batch at n and stacking
    tiles along H sidesteps the batch-minor move; the price is one
    garbage-row slice on the (dense-channel) output.  Boundary-crossing
    output rows are computed and discarded.
    """
    T = T or TILE_ROWS
    n, h, wd, c = x.shape
    s = stride
    Ti = T * s
    nt = -(-h // Ti)
    hp = nt * Ti
    if hp != h:
        x = jnp.pad(x, ((0, 0), (0, hp - h), (0, 0), (0, 0)))
    mid = x.reshape(n, nt, Ti, wd, c)
    top = jnp.pad(mid[:, :-1, Ti - 1:], ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0)))
    parts = [top, mid]
    # block rows: s==1 -> T+2 (halo top+bottom), s==2 -> 2T+2 (halo top +
    # one pad row keeping every block's start even for the stride)
    if s == 1:
        bot = jnp.pad(mid[:, 1:, :1], ((0, 0), (0, 1), (0, 0), (0, 0), (0, 0)))
        parts.append(bot)
    else:
        parts.append(jnp.zeros((n, nt, 1, wd, c), x.dtype))
    rows = Ti + 2
    stack = jnp.concatenate(parts, axis=2).reshape(n, nt * rows, wd, c)
    # H padding (0, 2): the last block's tail garbage rows keep the
    # output length at exactly nt * rows // s
    y = lax.conv_general_dilated(
        stack, w, (s, s), ((0, 2 if s == 1 else 1), (1, 1)),
        dimension_numbers=_DN,
        precision=precision,
        preferred_element_type=x.dtype,
    ).astype(x.dtype)
    y = y.reshape(n, nt, rows // s, -1, w.shape[-1])[:, :, :T]
    y = y.reshape(n, nt * T, -1, w.shape[-1])
    return y[:, :h // s]


def conv_transpose2d_tiled(x: jnp.ndarray, w: jnp.ndarray, precision,
                           T: int | None = None) -> jnp.ndarray:
    """k4/s2/pad-1 transposed conv (pre-flipped weights, see layers.py)
    with H folded into batch (exact)."""
    T = T or TILE_ROWS
    n, h, wd, c = x.shape
    nt = -(-h // T)
    hp = nt * T
    if hp != h:
        x = jnp.pad(x, ((0, 0), (0, hp - h), (0, 0), (0, 0)))
    mid = x.reshape(n, nt, T, wd, c)
    top = jnp.pad(mid[:, :-1, T - 1:], ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0)))
    bot = jnp.pad(mid[:, 1:, :1], ((0, 0), (0, 1), (0, 0), (0, 0), (0, 0)))
    tiles = jnp.concatenate([top, mid, bot], axis=2).reshape(n * nt, T + 2, wd, c)
    y = lax.conv_general_dilated(
        tiles, w, (1, 1), ((2, 2), (2, 2)),
        lhs_dilation=(2, 2),
        dimension_numbers=_DN,
        precision=precision,
        preferred_element_type=x.dtype,
    ).astype(x.dtype)
    # tile covers input rows [a-1, a+T+1); out_tile[j] = out_full[2(a-1)+j]
    y = y[:, 2:2 + 2 * T]
    y = y.reshape(n, nt * 2 * T, -1, w.shape[-1])
    return y[:, :2 * h]
