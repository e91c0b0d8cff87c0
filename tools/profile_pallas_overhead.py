"""Isolate pallas per-program overhead: does a full-array input block that
never changes index get re-fetched per grid step?"""
import os, sys, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/rife_tpu_jit_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W = 736, 1280
K = 10
img = jax.random.uniform(jax.random.PRNGKey(0), (H, W), jnp.float32)
small = jax.random.uniform(jax.random.PRNGKey(1), (H, W), jnp.float32)

def bench(name, fn, *args, reps=3):
    float(jnp.sum(fn(*args)))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jnp.sum(fn(*args)))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best/K*1000:.3f} ms/op", flush=True)

# A: tiled copy, no big operand
def k_copy(s_ref, o_ref):
    o_ref[...] = s_ref[...] * 2.0
@jax.jit
def copy_loop(s):
    def body(i, s):
        return pl.pallas_call(k_copy,
            grid=(H//8, W//128),
            in_specs=[pl.BlockSpec((8,128), lambda i,j:(i,j), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8,128), lambda i,j:(i,j), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((H,W), jnp.float32))(s)
    return lax.fori_loop(0, K, body, s)
bench("A tiled copy 920 programs", copy_loop, small)

# B: same + full-array input block with constant index
def k_copy2(big_ref, s_ref, o_ref):
    o_ref[...] = s_ref[...] + big_ref[0, 0]
@jax.jit
def copy2_loop(big, s):
    def body(i, s):
        return pl.pallas_call(k_copy2,
            grid=(H//8, W//128),
            in_specs=[pl.BlockSpec((H, W), lambda i,j:(0,0), memory_space=pltpu.VMEM),
                      pl.BlockSpec((8,128), lambda i,j:(i,j), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8,128), lambda i,j:(i,j), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((H,W), jnp.float32))(big, s)
    return lax.fori_loop(0, K, body, s)
bench("B +full-plane const block", copy2_loop, img, small)

# C: one program, in-kernel loop over tiles
def k_sweep(s_ref, o_ref):
    def body(t, _):
        i = t // (W//128); j = t % (W//128)
        o_ref[pl.ds(i*8, 8), pl.ds(j*128, 128)] = s_ref[pl.ds(i*8,8), pl.ds(j*128,128)] * 2.0
        return 0
    lax.fori_loop(0, (H//8)*(W//128), body, 0)
@jax.jit
def sweep_loop(s):
    def body(i, s):
        return pl.pallas_call(k_sweep,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((H,W), jnp.float32))(s)
    return lax.fori_loop(0, K, body, s)
bench("C single program in-kernel sweep", sweep_loop, small)

# D: plain XLA elementwise same size
@jax.jit
def xla_loop(s):
    def body(i, s):
        return s * 2.0
    return lax.fori_loop(0, K, body, s)
bench("D plain XLA elementwise", xla_loop, small)

# E: tiny pallas call (1 program, 8x128)
tiny = jnp.ones((8,128), jnp.float32)
def k_tiny(s_ref, o_ref):
    o_ref[...] = s_ref[...] * 2.0
@jax.jit
def tiny_loop(s):
    def body(i, s):
        return pl.pallas_call(k_tiny,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8,128), jnp.float32))(s)
    return lax.fori_loop(0, K, body, s)
bench("E tiny pallas call", tiny_loop, tiny)

# F: big grid, tiny work per program: is it per-program?
def k_noop(s_ref, o_ref):
    o_ref[...] = s_ref[...]
@jax.jit
def grid_loop(s):
    def body(i, s):
        return pl.pallas_call(k_noop,
            grid=(H//8, W//128),
            in_specs=[pl.BlockSpec((8,128), lambda i,j:(i,j), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8,128), lambda i,j:(i,j), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((H,W), jnp.float32))(s)
    return lax.fori_loop(0, K, body, s)
bench("F pure copy 920 programs", grid_loop, small)
