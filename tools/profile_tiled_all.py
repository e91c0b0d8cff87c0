"""Tiled-vs-ref across the model's conv shapes; deconv tiling too."""
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

def loopify(f, x):
    @jax.jit
    def g(x):
        def body(i, x):
            return x + jnp.mean(f(x)).astype(x.dtype)
        return lax.fori_loop(0, K, body, x)
    return g

DN = ("NHWC", "HWIO", "NHWC")

def conv_ref(x, w, s):
    return lax.conv_general_dilated(x, w, (s, s), ((1, 1), (1, 1)),
        dimension_numbers=DN, preferred_element_type=jnp.float32).astype(x.dtype)

def conv_tiled(x, w, s, T=16):
    n, h, wd, c = x.shape
    Ti = T * s
    nt = -(-h // Ti)
    hp = nt * Ti
    if hp != h:
        x = jnp.pad(x, ((0, 0), (0, hp - h), (0, 0), (0, 0)))
    mid = x.reshape(n, nt, Ti, wd, c)
    top = jnp.pad(mid[:, :-1, Ti - 1:], ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0)))
    parts = [top, mid]
    if s == 1:
        bot = jnp.pad(mid[:, 1:, :1], ((0, 0), (0, 1), (0, 0), (0, 0), (0, 0)))
        parts.append(bot)
    tiles = jnp.concatenate(parts, axis=2).reshape(n * nt, -1, wd, c)
    y = lax.conv_general_dilated(tiles, w, (s, s), ((0, 0), (1, 1)),
        dimension_numbers=DN, preferred_element_type=jnp.float32).astype(x.dtype)
    y = y.reshape(n, nt * T, wd // s, w.shape[-1])
    return y[:, :h // s]

def deconv_ref(x, w):
    return lax.conv_general_dilated(x, w, (1, 1), ((2, 2), (2, 2)),
        lhs_dilation=(2, 2), dimension_numbers=DN,
        preferred_element_type=jnp.float32).astype(x.dtype)

def deconv_tiled(x, w, T=16):
    n, h, wd, c = x.shape
    nt = -(-h // T)
    hp = nt * T
    if hp != h:
        x = jnp.pad(x, ((0, 0), (0, hp - h), (0, 0), (0, 0)))
    mid = x.reshape(n, nt, T, wd, c)
    top = jnp.pad(mid[:, :-1, T - 1:], ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0)))
    bot = jnp.pad(mid[:, 1:, :1], ((0, 0), (0, 1), (0, 0), (0, 0), (0, 0)))
    tiles = jnp.concatenate([top, mid, bot], axis=2).reshape(n * nt, T + 2, wd, c)
    y = lax.conv_general_dilated(tiles, w, (1, 1), ((2, 2), (2, 2)),
        lhs_dilation=(2, 2), dimension_numbers=DN,
        preferred_element_type=jnp.float32).astype(x.dtype)
    # tile covers input rows [a-1, a+T+1); out_tile[j] = out_full[2(a-1)+j]
    y = y[:, 2:2 + 2 * T]
    y = y.reshape(n, nt * 2 * T, wd * 2, w.shape[-1])
    return y[:, :2 * h]

# exactness checks
x32 = jax.random.uniform(key, (B, H//2, W//2, 32), DT)
w32 = jax.random.normal(jax.random.PRNGKey(5), (3, 3, 32, 32), DT) * 0.1
a = jax.jit(lambda x: conv_ref(x, w32, 1))(x32)
b = jax.jit(lambda x: conv_tiled(x, w32, 1))(x32)
print("s1 32ch maxdiff:", float(jnp.max(jnp.abs(a.astype(jnp.float32)-b.astype(jnp.float32)))))

x64 = jax.random.uniform(key, (B, H//2, W//2, 64), DT)
w_up3 = jax.random.normal(jax.random.PRNGKey(1), (4, 4, 64, 16), DT) * 0.1
a = jax.jit(lambda x: deconv_ref(x, w_up3))(x64)
b = jax.jit(lambda x: deconv_tiled(x, w_up3))(x64)
print("deconv maxdiff:", float(jnp.max(jnp.abs(a.astype(jnp.float32)-b.astype(jnp.float32)))), a.shape, b.shape)

bench("tiled s1 32->32 @1/2", loopify(lambda x: conv_tiled(x, w32, 1), x32), x32)
bench("tiled deconv 64->16 @1/2->full", loopify(lambda x: deconv_tiled(x, w_up3), x64), x64)

x16 = jax.random.uniform(key, (B, H, W, 16), DT)
w_f = jax.random.normal(jax.random.PRNGKey(3), (3, 3, 16, 3), DT) * 0.1
bench("tiled final conv 16->3 s1 @full", loopify(lambda x: conv_tiled(x, w_f, 1), x16), x16)

x90 = jax.random.uniform(key, (B, H//4, W//4, 90), DT)
w90 = jax.random.normal(jax.random.PRNGKey(6), (3, 3, 90, 90), DT) * 0.1
bench("ref conv 90->90 s1 @1/4", loopify(lambda x: conv_ref(x, w90, 1), x90), x90)
bench("tiled conv 90->90 s1 @1/4", loopify(lambda x: conv_tiled(x, w90, 1), x90), x90)

x128q = jax.random.uniform(key, (B, H//4, W//4, 128), DT)
w_up2 = jax.random.normal(jax.random.PRNGKey(2), (4, 4, 128, 32), DT) * 0.1
bench("tiled deconv 128->32 @1/4->1/2", loopify(lambda x: deconv_tiled(x, w_up2), x128q), x128q)
