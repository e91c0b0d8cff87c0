"""Exp21: can Mosaic do a PER-ELEMENT sublane gather?  (v6 feasibility)

v5's inner loop pays 8 lane-gathers per (channel, subtile, piece) — one
per window row — because the vertical tap row varies per pixel.  If
take_along_axis along axis 0 with a per-element (lane-varying) index
lowers well, the loop becomes 2 sublane + 2 lane gathers.  CLAUDE.md
records sublane-axis take_along_axis working only for lane-UNIFORM
indices (v4's roll-merge); this probes the general case, plus cost.

Probe kernels on one (8, 128) f32 block, K-chained:
  a. lane gather       y[s,l] = x[s, idx[s,l]]          (known good)
  b. sublane gather    y[s,l] = x[idx[s,l], l]          (the question)
  c. 8-row broadcast+lane-gather emulation of (b)'s data movement (the
     v5 pattern cost floor, for comparison)
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import functools
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("backend:", jax.default_backend(), flush=True)
S, L = 8, 128
NT = 512  # number of (8,128) tiles, grid-iterated
K = 50


def make(kname, body):
    def kernel(x_ref, i_ref, o_ref):
        o_ref[...] = body(x_ref[...], i_ref[...])

    @functools.partial(jax.jit, static_argnames=())
    def run(x, idx):
        return pl.pallas_call(
            kernel,
            grid=(NT,),
            in_specs=[pl.BlockSpec((1, S, L), lambda i: (i, 0, 0)),
                      pl.BlockSpec((1, S, L), lambda i: (i, 0, 0))],
            out_specs=pl.BlockSpec((1, S, L), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((NT, S, L), jnp.float32),
        )(x, idx)
    return run


def lane_gather(x, idx):
    return jnp.take_along_axis(x[0], idx[0], axis=1)[None]


def sublane_gather(x, idx):
    return jnp.take_along_axis(x[0], idx[0], axis=0)[None]


def broadcast8(x, idx):
    acc = jnp.zeros((S, L), jnp.float32)
    for s in range(S):
        row = jnp.broadcast_to(x[0, s:s + 1, :], (S, L))
        acc = acc + jnp.where(idx[0] == s, row, 0.0)
    return acc[None]


x = jax.random.uniform(jax.random.PRNGKey(0), (NT, S, L), jnp.float32)
idx_l = jax.random.randint(jax.random.PRNGKey(1), (NT, S, L), 0, L)
idx_s = jax.random.randint(jax.random.PRNGKey(2), (NT, S, L), 0, S)

ref_lane = np.take_along_axis(np.asarray(x), np.asarray(idx_l), axis=2)
ref_sub = np.take_along_axis(np.asarray(x), np.asarray(idx_s), axis=1)

for name, fn, idx, ref in [
    ("lane  per-elem", lane_gather, idx_l, ref_lane),
    ("sublane per-elem", sublane_gather, idx_s, ref_sub),
    ("bcast8 emul", broadcast8, idx_s, ref_sub),
]:
    try:
        run = make(name, fn)
        out = np.asarray(run(x, idx))
        ok = np.allclose(out, ref)

        @jax.jit
        def loop(x, idx, run=run):
            def body(i, a):
                return a + jnp.mean(run(x, idx))
            return lax.fori_loop(0, K, body, jnp.zeros((), jnp.float32))

        t0 = time.perf_counter(); float(loop(x, idx))
        comp = time.perf_counter() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter(); float(loop(x, idx))
            best = min(best, time.perf_counter() - t0)
        us = best / K / NT * 1e6
        print(f"{name}: correct={ok}  {us:.3f} us/tile  (compile {comp:.0f}s)",
              flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
print("done", flush=True)
