"""Microbenchmark Mosaic tpu.dynamic_gather via Pallas take_along_axis."""
import os
import sys
import time
import functools

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/rife_tpu_jit_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W = 736, 1280


def bench(name, fn, *args, iters=10):
    try:
        float(jnp.sum(fn(*args)))
        t0 = time.perf_counter()
        for _ in range(iters):
            float(jnp.sum(fn(*args)))
        print(f"{name}: {(time.perf_counter()-t0)/iters*1000:.2f} ms/iter", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)


x = jax.random.uniform(jax.random.PRNGKey(0), (H, W), jnp.float32)
idx_lane = jax.random.randint(jax.random.PRNGKey(1), (H, W), 0, W, jnp.int32)
idx_sub = jax.random.randint(jax.random.PRNGKey(2), (H, W), 0, H, jnp.int32)
idx_lane_small = jax.random.randint(jax.random.PRNGKey(3), (H, W), 0, 128, jnp.int32)


def g_kernel(axis, x_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=axis)


def make(axis):
    return jax.jit(lambda x, i: pl.pallas_call(
        functools.partial(g_kernel, axis),
        out_shape=jax.ShapeDtypeStruct((H, W), x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, i))


@jax.jit
def baseline(x):
    return x * 2.0


bench("baseline elementwise (H,W)", baseline, x)
bench("pallas gather axis1 (lane, full W)", make(1), x, idx_lane)
bench("pallas gather axis1 (lane, idx<128)", make(1), x, idx_lane_small)
bench("pallas gather axis0 (sublane, full H)", make(0), x, idx_sub)
