"""Round-3 experiment batch 2 (TPU): v5 warp kernel vs v3/v4 at the
real 720p batch-4 model shapes, plus a corrected in-kernel gather
microbench (32-wide unrolled body, 1M+ bodies so RTT is amortized)."""
import os, sys, time, functools
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rife_tpu.ops import resize_bilinear
from rife_tpu.ops.warp import warp_xla
from rife_tpu.ops.pallas.warp import warp_pallas
from rife_tpu.ops.pallas.warp_v4 import warp_pallas_v4
from rife_tpu.ops.pallas.warp_v5 import warp_pallas_v5

print("backend:", jax.default_backend(), flush=True)

# ------------------------------------------------------------- microbench
OUTER = 40000
UNROLL = 32  # bodies per fori iteration


def bench(name, fn, *args, reps=4, scale=1.0):
    try:
        float(jnp.sum(fn(*args)))
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            float(jnp.sum(fn(*args)))
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {best/scale*1e3:.4f} ms-unit", flush=True)
        return best / scale
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:250]}", flush=True)
        return None


x8 = jax.random.uniform(jax.random.PRNGKey(0), (8, 128), jnp.float32)
idx = jax.random.randint(jax.random.PRNGKey(1), (8, 128), 0, 127, jnp.int32)
idx0 = jax.random.randint(jax.random.PRNGKey(2), (8, 128), 0, 8, jnp.int32)
wts = jax.random.uniform(jax.random.PRNGKey(3), (8, 128), jnp.float32)


def micro(body):
    def kernel(x_ref, i_ref, i0_ref, w_ref, o_ref):
        def it(r, acc):
            for _ in range(UNROLL):
                acc = acc * 0.9999 + body(x_ref[...] + acc * 1e-6,
                                          i_ref[...], i0_ref[...], w_ref[...])
            return acc
        o_ref[...] = lax.fori_loop(0, OUTER, it, jnp.zeros((8, 128), jnp.float32))
    return jax.jit(lambda x, i, i0, w: pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))(x, i, i0, w))


NB = OUTER * UNROLL  # bodies
print(f"[microbench: ns/body over {NB} bodies]", flush=True)


def unpack(g):
    u = lax.bitcast_convert_type(g, jnp.uint32)
    v0 = lax.bitcast_convert_type(u << 16, jnp.float32)
    v1 = lax.bitcast_convert_type((u >> 16) << 16, jnp.float32)
    return v0, v1


for name, body in [
    ("base", lambda s, i, i0, w: s),
    ("+1 mul", lambda s, i, i0, w: s * 1.0001),
    ("+1 lane gather", lambda s, i, i0, w: jnp.take_along_axis(s, i, axis=1)),
    ("+1 sublane gather", lambda s, i, i0, w: jnp.take_along_axis(s, i0, axis=0)),
    ("+unpack", lambda s, i, i0, w: sum(unpack(s))),
    ("v4row", lambda s, i, i0, w: jnp.take_along_axis(s, i, axis=1) * w
     + jnp.take_along_axis(s, jnp.clip(i + 1, 0, 127), axis=1) * (1 - w)),
    ("v5row", lambda s, i, i0, w: (lambda ab: ab[0] * w + ab[1] * (1 - w))(
        unpack(jnp.take_along_axis(s, i, axis=1)))),
]:
    t = bench(f"micro {name}", micro(body), x8, idx, idx0, wts, scale=NB / 1e6)
    # scale: best/ (NB/1e6) => ms per 1e6 bodies => ns/body

# ------------------------------------------------------------- warp shapes
K = 20
B, H, W = 4, 736, 1280
coarse = jax.random.normal(jax.random.PRNGKey(2), (B, H // 32, W // 32, 2),
                           jnp.float32) * 3


def kloop(warp_fn):
    @jax.jit
    def f(a, fl):
        def body(i, v):
            return warp_fn(v, fl)
        return jnp.mean(lax.fori_loop(0, K, body, a))
    return f


cases = [
    ("img 3ch 736x1280 b4", (B, H, W, 3), 1.0),
    ("feat 16ch 368x640 b8", (2 * B, H // 2, W // 2, 16), 0.5),
    ("feat 32ch 184x320 b8", (2 * B, H // 4, W // 4, 32), 0.25),
    ("feat 64ch 92x160 b8", (2 * B, H // 8, W // 8, 64), 0.125),
    ("feat 128ch 46x80 b8", (2 * B, H // 16, W // 16, 128), 0.0625),
]

for name, shape, fscale in cases:
    n, hh, ww, c = shape
    img = jax.random.uniform(jax.random.PRNGKey(5), shape, jnp.bfloat16)
    fl = resize_bilinear(coarse[:1].repeat(n, 0), (hh, ww)).astype(jnp.float32) * fscale
    base_fn = warp_pallas if c < 8 else warp_pallas_v4
    bench(f"{name} v3/v4 (current)", kloop(base_fn), img, fl, scale=K)
    bench(f"{name} v5", kloop(warp_pallas_v5), img, fl, scale=K)
    # one-shot correctness vs exact XLA on TPU
    try:
        ref = warp_xla(img, fl)
        d5 = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                   - warp_pallas_v5(img, fl).astype(jnp.float32))))
        print(f"{name} v5 maxerr vs xla: {d5:.5f}", flush=True)
    except Exception as e:
        print(f"{name} xla check FAILED {str(e)[:200]}", flush=True)

print("done", flush=True)
