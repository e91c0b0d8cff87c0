"""Does a constant-index full-array block get re-copied per program?"""
import os, sys, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/rife_tpu_jit_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from jax import lax
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W = 736, 1280
K = 10
img = jax.random.uniform(jax.random.PRNGKey(0), (H, W), jnp.float32)

def bench(name, fn, *args, reps=3):
    float(jnp.sum(fn(*args)))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jnp.sum(fn(*args)))
        best = min(best, time.perf_counter()-t0)
    print(f"{name}: {(best*1000-31)/K:.2f} ms/op net", flush=True)

def k(big_ref, o_ref):
    o_ref[...] = big_ref[pl.ds(0, 8), pl.ds(0, 128)]

for gh, gw in [(1, 1), (4, 4), (23, 5), (92, 10)]:
    @jax.jit
    def loop(big, gh=gh, gw=gw):
        def body(i, big):
            out = pl.pallas_call(k,
                grid=(gh, gw),
                in_specs=[pl.BlockSpec((H, W), lambda i,j:(0,0), memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((8,128), lambda i,j:(i,j), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((gh*8, gw*128), jnp.float32))(big)
            return big + out[0,0]*1e-9
        return lax.fori_loop(0, K, body, img)
    bench(f"grid {gh}x{gw} = {gh*gw} programs", loop, img)
