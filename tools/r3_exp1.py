"""Round-3 experiment batch 1 (TPU).

1. In-kernel microbench: lane/sublane gather cost vs plain VPU ops, and
   the v5 candidate inner loop (1 packed gather + shift-unpack) vs the
   v4 inner loop (2 gathers).  Loop-carried dependency through the
   gathered operand so Mosaic cannot hoist the gather.
2. Feasibility: PrefetchScalarGridSpec index_map that picks the INPUT
   block from a scalar-prefetch array (dynamic row-windowed DMA).
3. VMEM budget sweep for the image warp: at 720p b4 c3 the 5.6MB budget
   forces cb=1 (index math x3); measure cb=1 vs cb=3 with a 13MB budget.
"""
import os, sys, time, functools
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("backend:", jax.default_backend(), flush=True)

# ---------------------------------------------------------------- 1: micro
R = 4000
x8 = jax.random.uniform(jax.random.PRNGKey(0), (8, 128), jnp.float32)
idx = jax.random.randint(jax.random.PRNGKey(1), (8, 128), 0, 128, jnp.int32)
idx0 = jax.random.randint(jax.random.PRNGKey(2), (8, 128), 0, 8, jnp.int32)
w0 = jax.random.uniform(jax.random.PRNGKey(3), (8, 128), jnp.float32)
w1 = 1.0 - w0


def bench(name, fn, *args, reps=4, scale=R):
    try:
        float(jnp.sum(fn(*args)))
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            float(jnp.sum(fn(*args)))
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {best*1e9/scale:.1f} ns/iter", flush=True)
        return best / scale
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)
        return None


def make(body):
    def kernel(x_ref, i_ref, i0_ref, o_ref):
        def it(r, acc):
            return acc * 0.9999 + body(x_ref[...] + acc * 1e-6, i_ref[...], i0_ref[...])
        o_ref[...] = lax.fori_loop(0, R, it, jnp.zeros((8, 128), jnp.float32))
    return jax.jit(lambda x, i, i0: pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))(x, i, i0))


MASK_HI = jnp.uint32(0xFFFF0000)


def unpack(g):
    u = lax.bitcast_convert_type(g, jnp.uint32)
    v0 = lax.bitcast_convert_type(u << 16, jnp.float32)
    v1 = lax.bitcast_convert_type(u & MASK_HI, jnp.float32)
    return v0, v1


t_base = bench("base (3 ops)", make(lambda s, i, i0: s), x8, idx, idx0)
bench("+1 mul", make(lambda s, i, i0: s * 1.0001), x8, idx, idx0)
bench("+1 lane gather", make(lambda s, i, i0: jnp.take_along_axis(s, i, axis=1)), x8, idx, idx0)
bench("+2 lane gathers", make(
    lambda s, i, i0: jnp.take_along_axis(s, i, axis=1)
    + jnp.take_along_axis(s, jnp.clip(i + 1, 0, 127), axis=1)), x8, idx, idx0)
bench("+1 sublane gather", make(lambda s, i, i0: jnp.take_along_axis(s, i0, axis=0)), x8, idx, idx0)
bench("+unpack only", make(lambda s, i, i0: sum(unpack(s))), x8, idx, idx0)
# v4-style inner row: broadcast + 2 gathers + 2fma
bench("v4 row (2 gathers+fma)", make(
    lambda s, i, i0: jnp.take_along_axis(s, i, axis=1) * w0
    + jnp.take_along_axis(s, jnp.clip(i + 1, 0, 127), axis=1) * w1), x8, idx, idx0)
# v5-style inner row: 1 gather + unpack + 2fma
def v5_row(s, i, i0):
    g = jnp.take_along_axis(s, i, axis=1)
    a, b = unpack(g)
    return a * w0 + b * w1
bench("v5 row (1 gather+unpack+fma)", make(v5_row), x8, idx, idx0)

# ------------------------------------------------- 2: dynamic index_map
NB, BH, W = 8, 8, 256
xsrc = jnp.arange(NB * BH * W, dtype=jnp.float32).reshape(NB * BH, W)
sel = jnp.array([3, 0, 5, 1], dtype=jnp.int32)


def sel_kernel(sc_ref, x_ref, o_ref):
    o_ref[...] = x_ref[...] * 2.0


try:
    out = pl.pallas_call(
        sel_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(4,),
            in_specs=[pl.BlockSpec((BH, W), lambda i, sc: (sc[i], 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((BH, W), lambda i, sc: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((4 * BH, W), jnp.float32),
    )(sel, xsrc)
    want = jnp.concatenate([xsrc[s * BH:(s + 1) * BH] * 2.0 for s in sel])
    err = float(jnp.max(jnp.abs(out - want)))
    print(f"dynamic index_map: OK, max err {err}", flush=True)
except Exception as e:
    print(f"dynamic index_map: FAILED {type(e).__name__}: {str(e)[:400]}", flush=True)

# ------------------------------------------------- 3: image warp cb sweep
from rife_tpu.ops import resize_bilinear
import rife_tpu.ops.pallas.warp as wmod

B, H, WW = 4, 736, 1280
img = jax.random.uniform(jax.random.PRNGKey(0), (B, H, WW, 3), jnp.bfloat16)
coarse = jax.random.normal(jax.random.PRNGKey(2), (B, H // 32, WW // 32, 2),
                           jnp.float32) * 3
flow = resize_bilinear(coarse, (H, WW)).astype(jnp.bfloat16)
K = 10


def warp_budget(img, flow, budget, tile_h=32, skip=None):
    """warp_pallas with an explicit VMEM budget (copy of the wrapper)."""
    n, h, w, c = img.shape
    out_dtype = img.dtype
    hp = wmod._ceil_to(h, tile_h)
    wp = wmod._ceil_to(w, wmod.TILE_W)
    win_h, win_w = min(32, hp), min(256, wp)
    plane_dt = img.dtype if img.dtype == jnp.bfloat16 else jnp.float32
    plane_bytes = hp * wp * jnp.dtype(plane_dt).itemsize
    per_cb = plane_bytes + tile_h * wmod.TILE_W * 4
    cb = max(1, min(c, budget // per_cb))
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
    scalars = wmod._tile_scalars(jnp.moveaxis(flow_pl, 1, -1), h, w, hp, wp,
                                 win_h, win_w)
    grid = (n * cg, hp // tile_h, wp // wmod.TILE_W)
    kernel = functools.partial(
        wmod._warp_kernel, H=h, W=w, win_h=win_h, win_w=win_w, cb=cb, cg=cg,
        nsh=hp // 8, nsw=wp // 128, tile_h=tile_h, skip=skip)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, cb, hp, wp),
                             lambda g, i, j, *_, cg=cg: (g // cg, g % cg, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2, tile_h, wmod.TILE_W),
                             lambda g, i, j, *_, cg=cg: (g // cg, 0, i, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, cb, tile_h, wmod.TILE_W),
                lambda g, i, j, *_, cg=cg: (g // cg, g % cg, i, j),
                memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((cb, 8, 128), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((n, c, hp, wp), plane_dt),
    )(scalars, planes, flow_pl)
    out = out[:, :, :h, :w]
    return jnp.moveaxis(out, 1, -1).astype(out_dtype)


for name, budget, skip in [
    ("img warp budget 5.6MB (cb=1, current)", int(5.6 * 2**20), None),
    ("img warp budget 13MB (cb=3) noskip", 13 * 2**20, None),
    ("img warp budget 13MB (cb=3) skip", 13 * 2**20, True),
]:
    f = jax.jit(lambda a, fl, b=budget, s=skip: jnp.mean(lax.fori_loop(
        0, K, lambda i, v: warp_budget(v, fl, b, skip=s), a)))
    bench(name, f, img, flow, scale=K)

print("done", flush=True)
