"""Dissect the IFBlock conv0 stem cost (small-C high-res stride-2 convs).

Chained-in-jit methodology (see CLAUDE.md): K reps inside one jit,
scalar fetch, subtract the ~31 ms dispatch floor.
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/rife_tpu_jit_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from jax import lax

B, H, W = 4, 736, 1280
K = 10
DT = jnp.bfloat16

key = jax.random.PRNGKey(0)


def bench(name, fn, *args, reps=3):
    float(jnp.sum(fn(*args)))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jnp.sum(fn(*args)))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {(best*1000-31)/K:.2f} ms/op net", flush=True)


def conv(x, w, stride, pet=jnp.float32):
    return lax.conv_general_dilated(
        x, w, (stride, stride), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=pet).astype(x.dtype)


def loopify(f, x):
    @jax.jit
    def g(x):
        def body(i, x):
            return x + jnp.mean(f(x)).astype(x.dtype)
        return lax.fori_loop(0, K, body, x)
    return g


x17 = jax.random.uniform(key, (B, H, W, 17), DT)
w1 = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 17, 45), DT) * 0.1
w2 = jax.random.normal(jax.random.PRNGKey(2), (3, 3, 45, 90), DT) * 0.1

bench("conv1 17->45 s2 @full", loopify(lambda x: conv(x, w1, 2), x17), x17)

x45 = jax.random.uniform(key, (B, H // 2, W // 2, 45), DT)
bench("conv2 45->90 s2 @1/2", loopify(lambda x: conv(x45, w2, 2), x45), x45)

# bf16 accumulation
bench("conv1 bf16-accum", loopify(lambda x: conv(x, w1, 2, jnp.bfloat16), x17), x17)

# pad cin to 32
w1p = jnp.pad(w1, ((0, 0), (0, 0), (0, 15), (0, 0)))
x32 = jnp.pad(x17, ((0, 0), (0, 0), (0, 0), (0, 15)))
bench("conv1 cin padded 32", loopify(lambda x: conv(x, w1p, 2), x32), x32)

# pad cout to 64
w1q = jnp.pad(w1, ((0, 0), (0, 0), (0, 0), (0, 19)))
bench("conv1 cout padded 64", loopify(lambda x: conv(x, w1q, 2), x17), x17)

# pad cout to 128
w1r = jnp.pad(w1, ((0, 0), (0, 0), (0, 0), (0, 83)))
bench("conv1 cout padded 128", loopify(lambda x: conv(x, w1r, 2), x17), x17)

# stride-1 at half res equivalent-flops probe (is stride the problem?)
xh = jax.random.uniform(key, (B, H // 2, W // 2, 17), DT)
bench("conv 17->45 s1 @1/2 (flops-equiv)", loopify(lambda x: conv(xh, w1, 1), xh), xh)

# im2col patches + matmul
def im2col(x):
    p = lax.conv_general_dilated_patches(
        x, (3, 3), (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jnp.einsum("nhwk,ko->nhwo", p,
                      w1.transpose(2, 0, 1).reshape(-1, 45)[:p.shape[-1]],
                      preferred_element_type=jnp.float32).astype(x.dtype)
bench("conv1 im2col+matmul", loopify(im2col, x17), x17)
