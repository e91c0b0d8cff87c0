import os, sys, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/rife_tpu_jit_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 2000
x = jax.random.uniform(jax.random.PRNGKey(0), (8,128), jnp.float32)
idx = jax.random.randint(jax.random.PRNGKey(1), (8,128), 0, 128, jnp.int32)
idx0 = jax.random.randint(jax.random.PRNGKey(2), (8,128), 0, 8, jnp.int32)

def bench(name, fn, *args, reps=4):
    float(jnp.sum(fn(*args)))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jnp.sum(fn(*args)))
        best = min(best, time.perf_counter()-t0)
    print(f"{name}: {best*1e6/R:.2f} us/iter ({best*1000:.1f} ms total)", flush=True)

def make(body):
    def kernel(x_ref, i_ref, o_ref):
        def it(r, acc):
            return acc + body(x_ref[...], i_ref[...], r)
        o_ref[...] = lax.fori_loop(0, R, it, jnp.zeros((8,128), jnp.float32))
    return jax.jit(lambda x, i: pl.pallas_call(kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8,128), jnp.float32))(x, i))

bench("add only", make(lambda x, i, r: x * 1.0001), x, idx)
bench("lane gather (axis1)", make(lambda x, i, r: jnp.take_along_axis(x, i, axis=1)), x, idx)
bench("sublane gather real", make(lambda x, i, r: jnp.take_along_axis(x, jnp.clip(i, 0, 7), axis=0)), x, idx0)
bench("const sublane bcast", make(lambda x, i, r: jnp.take_along_axis(x, jnp.full((8,128), 3, jnp.int32), axis=0)), x, idx)
bench("dyn sublane bcast (r%8)", make(lambda x, i, r: jnp.take_along_axis(x, jnp.full((8,128), 1, jnp.int32)*(r%8), axis=0)), x, idx)
