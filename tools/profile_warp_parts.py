import os, sys, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/rife_tpu_jit_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from jax import lax
from rife_tpu.ops import resize_bilinear
import rife_tpu.ops.pallas.warp as pw

B, H, W, C = 4, 736, 1280, 3
K = 10
img = jax.random.uniform(jax.random.PRNGKey(0), (B, H, W, C), jnp.bfloat16)
coarse = jax.random.normal(jax.random.PRNGKey(2), (B, H//32, W//32, 2), jnp.float32) * 3
flow = resize_bilinear(coarse, (H, W)).astype(jnp.bfloat16)

def bench(name, fn, *args, reps=3):
    float(jnp.sum(fn(*args)))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jnp.sum(fn(*args)))
        best = min(best, time.perf_counter()-t0)
    print(f"{name}: {best/K*1000:.2f} ms/op ({best*1000:.0f} total)", flush=True)

@jax.jit
def transpose_loop(a):
    def body(i, a):
        t = jnp.moveaxis(a, -1, 1).astype(jnp.float32)
        return jnp.moveaxis(t, 1, -1).astype(jnp.bfloat16) * 1.0001
    return lax.fori_loop(0, K, body, a)
bench("moveaxis roundtrip + cast", transpose_loop, img)

@jax.jit
def scalars_loop(f):
    def body(i, f):
        wy, wx, nch, nblk = pw._tile_scalars(f.astype(jnp.float32), H, W, H, W, 64, 512)
        return f + wy.sum().astype(f.dtype) * 0
    return lax.fori_loop(0, K, body, f)
bench("_tile_scalars", scalars_loop, flow)

planes = jnp.moveaxis(img, -1, 1).astype(jnp.float32)
flow32 = flow.astype(jnp.float32)
wy, wx, nch, nblk = pw._tile_scalars(flow32, H, W, H, W, 64, 512)
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu
cb, cg = 1, C
kernel = functools.partial(pw._warp_kernel, H=H, W=W, win_h=64, win_w=512, cb=cb, cg=cg)
def call_kernel(wy, wx, nch, nblk, planes, flow32):
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(B*cg, H//8, W//128),
            in_specs=[
                pl.BlockSpec((1, cb, H, W), lambda g,i,j,*_: (g//cg, g%cg, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1,8,128,2), lambda g,i,j,*_: (g//cg, i, j, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, cb, 8, 128), lambda g,i,j,*_: (g//cg, g%cg, i, j), memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((8,128), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((B, C, H, W), jnp.float32),
    )(wy, wx, nch, nblk, planes, flow32)

@jax.jit
def kernel_loop(wy, wx, nch, nblk, planes, flow32):
    def body(i, p):
        return call_kernel(wy, wx, nch, nblk, p, flow32) * 0.5 + p * 0.5
    return lax.fori_loop(0, K, body, planes)
bench("pallas kernel only (pre-transposed)", kernel_loop, wy, wx, nch, nblk, planes, flow32)
