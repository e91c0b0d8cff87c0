"""Multi-chip inference sharding.

Two TPU-native scaling modes for serving (SURVEY.md §2.7/§5 — the
reference has no inference parallelism at all; its only scaling knob is
`--scale`):

1. `interpolate_batch_sharded` — EXACT data parallelism: frame pairs
   sharded over the mesh's `data` axis, params replicated, one jitted
   forward; XLA inserts no collectives on the forward path (outputs stay
   sharded until fetched).  This is the throughput mode: N concurrent
   streams (or N batched gaps of one stream) on N chips.

2. `interpolate_spatial` — single-stream latency mode for very large
   frames (4K+): the frame is split into horizontal slabs, one per
   device, each extended by a halo of `margin` rows exchanged with its
   neighbours over ICI (lax.ppermute inside shard_map); every device
   runs the full model on its slab+halo and crops the halo off.

   Seam contract: the model's receptive field is unbounded in theory
   (coarse pyramid level + 8-conv blocks), so slab outputs are NOT
   bit-identical to the single-device run.  With the default 64-row
   margin the interior difference is driven by the pyramid's 1/16-scale
   features and measured small on smooth content (see
   tests/test_spatial.py); rows within a receptive-field tail of the
   global top/bottom additionally see zero-halo instead of conv padding.
   This is the standard overlap-tiling tradeoff — use the exact batch
   mode when bit-parity matters.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
try:  # moved out of experimental in jax 0.8 (check_rep -> check_vma)
    from jax import shard_map
    _SHARD_MAP_KW = {"check_vma": False}
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map
    _SHARD_MAP_KW = {"check_rep": False}
from jax.sharding import NamedSharding, PartitionSpec as P

from rife_tpu.parallel.mesh import replicated_sharding


def interpolate_batch_sharded(engine, mesh, img0, img1, timestep: float = 0.5,
                              axis: str = "data"):
    """Exact DP serving: shard the pair batch over `axis`, replicate params.

    Batch must divide the mesh axis size.  Returns the merged frames with
    the same sharding (fetch or keep on-device for the writer thread).
    """
    n = img0.shape[0]
    d = mesh.shape[axis]
    assert n % d == 0, f"batch {n} must divide mesh axis {axis}={d}"
    sh = NamedSharding(mesh, P(axis))
    rep = replicated_sharding(mesh)
    img0 = jax.device_put(img0, sh)
    img1 = jax.device_put(img1, sh)
    params = jax.device_put(engine.params, rep)

    key = ("dp", mesh, img0.shape, img0.dtype, engine._trace_key())
    fn = engine._cache.get(key)
    if fn is None:
        fn = jax.jit(
            functools.partial(engine._forward, tta=False),
            in_shardings=(rep, sh, sh, rep),
            out_shardings=sh,
        )
        engine._cache[key] = fn

    from rife_tpu.ops import use_warp_impl

    t = jnp.asarray(timestep, jnp.float32)
    with use_warp_impl(engine.warp_impl):
        return fn(params, img0, img1, t)


def interpolate_spatial(engine, mesh, img0, img1, timestep: float = 0.5,
                        margin: int = 64, axis: str = "data",
                        on_violation: str = "fallback"):
    """Spatially-sharded single-pair inference with ICI halo exchange.

    img0/img1: (N, H, W, C) with H divisible by (devices * pad_multiple)
    and margin a multiple of the model's pad granularity.

    Motion guard: the seam bound only holds while the model's vertical
    flow stays inside the halo (|flow_y| <= margin) — beyond it the warp
    clamps at the slab edge and seams corrupt silently.  Every call
    therefore also computes max|flow_y| of the finest flow on-device
    (pmax-reduced over the mesh, one extra scalar fetch) and applies
    `on_violation` when it exceeds `margin`:

    - "fallback" (default): recompute the pair exactly on one device via
      engine.interpolate and return that (correct, slower).
    - "raise": raise ValueError.
    - "ignore": return the slab result anyway (caller accepts clamping).

    Tradeoffs: the guard costs ONE scalar device->host fetch per call
    (a sync point — acceptable in this 4K latency mode, wrong for a
    throughput loop; use interpolate_batch_sharded there).  Slabs are
    split along H only (dim 1) and span the full width, which is why
    only |flow_y| is guarded — a W-axis split would need an |flow_x|
    guard too (asserted below so that extension can't silently skip it).

    Global top/bottom slabs get replicate-halos (their own edge row
    repeated) instead of the zeros ppermute leaves behind — much closer
    to the true frame-boundary behavior (conv zero-pad + warp border
    clamp happen `margin` rows away from real content either way, but
    replicated content doesn't bleed darkness into the convs).
    """
    assert on_violation in ("fallback", "raise", "ignore"), on_violation
    d = mesh.shape[axis]
    n, h, w, c = img0.shape
    pm = engine.pad_multiple
    assert h % (d * pm) == 0, f"H={h} must divide devices*{pm}={d * pm}"
    assert margin % pm == 0, f"margin must be a multiple of {pm}"

    sh = NamedSharding(mesh, P(None, axis))
    rep = replicated_sharding(mesh)
    params = jax.device_put(engine.params, rep)
    img0 = jax.device_put(img0, sh)
    img1 = jax.device_put(img1, sh)

    key = ("spatial", mesh, img0.shape, img0.dtype, margin,
           engine._trace_key())
    fn = engine._cache.get(key)
    if fn is None:
        fwd = functools.partial(engine._forward, tta=False, with_flow=True)

        def per_slab(params, a, b, t):
            # a, b: (N, H/d, W, C) local slabs
            fwd_perm = [(i, i + 1) for i in range(d - 1)]
            bwd_perm = [(i + 1, i) for i in range(d - 1)]
            idx = lax.axis_index(axis)

            def with_halo(x):
                top = lax.ppermute(x[:, -margin:], axis, fwd_perm)
                bot = lax.ppermute(x[:, :margin], axis, bwd_perm)
                rep_top = jnp.broadcast_to(x[:, :1], top.shape)
                rep_bot = jnp.broadcast_to(x[:, -1:], bot.shape)
                top = jnp.where(idx == 0, rep_top, top)
                bot = jnp.where(idx == d - 1, rep_bot, bot)
                return jnp.concatenate([top, x, bot], axis=1)

            out, flow = fwd(params, with_halo(a), with_halo(b), t)
            # flow channels are (dx0, dy0, dx1, dy1): guard the y motion.
            # Guarding ONLY y is sound iff the shard axis is H (slabs are
            # full-width, so x-clamping never crosses a seam).
            assert a.shape[2] == w, "W must not be sharded (flow_x unguarded)"
            mx = jnp.max(jnp.abs(flow[..., 1::2].astype(jnp.float32)))
            return out[:, margin:-margin], lax.pmax(mx, axis)

        fn = jax.jit(shard_map(
            per_slab, mesh=mesh,
            in_specs=(P(), P(None, axis), P(None, axis), P()),
            out_specs=(P(None, axis), P()),
            **_SHARD_MAP_KW,
        ))
        engine._cache[key] = fn

    from rife_tpu.ops import use_warp_impl

    t = jnp.asarray(timestep, jnp.float32)
    with use_warp_impl(engine.warp_impl):
        out, maxflow = fn(params, img0, img1, t)
    if float(maxflow) > margin and on_violation != "ignore":
        msg = (f"spatial-shard motion guard: max|flow_y|={float(maxflow):.1f} "
               f"exceeds the {margin}-row halo; seams would clamp")
        if on_violation == "raise":
            raise ValueError(msg)
        import warnings

        warnings.warn(msg + " — falling back to exact single-device inference")
        return engine.interpolate(img0, img1, timestep)
    return out
