import os, sys, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/rife_tpu_jit_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from jax import lax
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu
import rife_tpu.ops.pallas.warp as pw
from rife_tpu.ops import resize_bilinear

B, H, W, C = 4, 736, 1280, 3
K = 10
img = jax.random.uniform(jax.random.PRNGKey(0), (B, H, W, C), jnp.bfloat16)
coarse = jax.random.normal(jax.random.PRNGKey(2), (B, H//32, W//32, 2), jnp.float32) * 3
flow32 = resize_bilinear(coarse, (H, W)).astype(jnp.float32)
planes = jnp.moveaxis(img, -1, 1).astype(jnp.float32)
wy, wx, nch, nblk = pw._tile_scalars(flow32, H, W, H, W, 64, 512)

def bench(name, fn, *args, reps=3):
    float(jnp.sum(fn(*args)))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jnp.sum(fn(*args)))
        best = min(best, time.perf_counter()-t0)
    print(f"{name}: {(best*1000-31)/K:.2f} ms/op net", flush=True)

def variant(kernel_body, with_scalars=True, with_img=True, name=""):
    in_specs = []
    if with_img:
        in_specs.append(pl.BlockSpec((1, 1, H, W), lambda g,i,j,*_: (g//C, g%C, 0, 0), memory_space=pltpu.VMEM))
    in_specs.append(pl.BlockSpec((1,8,128,2), lambda g,i,j,*_: (g//C, i, j, 0), memory_space=pltpu.VMEM))
    if with_scalars:
        gs = pltpu.PrefetchScalarGridSpec(num_scalar_prefetch=4, grid=(B*C, H//8, W//128),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1,1,8,128), lambda g,i,j,*_: (g//C, g%C, i, j), memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((8,128), jnp.float32)])
        def call(*a):
            return pl.pallas_call(kernel_body, grid_spec=gs,
                out_shape=jax.ShapeDtypeStruct((B, C, H, W), jnp.float32))(*a)
    else:
        gs = pltpu.PrefetchScalarGridSpec(num_scalar_prefetch=0, grid=(B*C, H//8, W//128),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1,1,8,128), lambda g,i,j: (g//C, g%C, i, j), memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((8,128), jnp.float32)])
        def call(*a):
            return pl.pallas_call(kernel_body, grid_spec=gs,
                out_shape=jax.ShapeDtypeStruct((B, C, H, W), jnp.float32))(*a)
    return call

# V1: trivial body, full machinery
def k_trivial(wy_ref, wx_ref, nch_ref, nblk_ref, img_ref, flow_ref, out_ref, acc_ref):
    out_ref[0,0] = flow_ref[0,...,0]
call1 = variant(k_trivial)
@jax.jit
def loop1(wy, wx, nch, nblk, planes, flow32):
    def body(i, p):
        return call1(wy, wx, nch, nblk, p, flow32)
    return lax.fori_loop(0, K, body, planes)
bench("trivial body + scalars + img block", loop1, wy, wx, nch, nblk, planes, flow32)

# V2: trivial body, no scalar prefetch
def k_trivial2(img_ref, flow_ref, out_ref, acc_ref):
    out_ref[0,0] = flow_ref[0,...,0]
call2 = variant(k_trivial2, with_scalars=False)
@jax.jit
def loop2(planes, flow32):
    def body(i, p):
        return call2(p, flow32)
    return lax.fori_loop(0, K, body, planes)
bench("trivial body no scalars", loop2, planes, flow32)

# V3: trivial body, no img block
def k_trivial3(wy_ref, wx_ref, nch_ref, nblk_ref, flow_ref, out_ref, acc_ref):
    out_ref[0,0] = flow_ref[0,...,0]
call3 = variant(k_trivial3, with_img=False)
@jax.jit
def loop3(wy, wx, nch, nblk, flow32):
    def body(i, f):
        o = call3(wy, wx, nch, nblk, f)
        return f + o[:, 0, :, :, None][..., 0:2]*0
    return lax.fori_loop(0, K, body, flow32)
bench("trivial body no img block", loop3, wy, wx, nch, nblk, flow32)
