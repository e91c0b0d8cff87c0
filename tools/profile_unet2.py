"""U-Net conv/deconv MFU audit: dilated vs phase-decomposed vs tiled.

Unet measured ~15 ms/call at ~200 GF => ~13 TF/s (7% MFU).  Suspects:
the k4/s2 transposed convs lowered as lhs-dilated convs (4x zero work)
at spatial sizes below the H-tiling threshold.
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/rife_tpu_jit_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from jax import lax
from rife_tpu.nn.layers import conv_transpose2d, _deconv422_phase, conv2d, use_conv_tiling
from rife_tpu.nn import deconv_prelu_params, conv_prelu_params

K = 50
B = 4

def bench(name, fn, x, p, gflop):
    @jax.jit
    def loop(a):
        def body(i, a):
            o = fn(a, p)
            return a + jnp.mean(o).astype(a.dtype)
        return jnp.mean(lax.fori_loop(0, K, body, a))
    t0 = time.perf_counter(); float(loop(x))
    print(f"  [{name} compile {time.perf_counter()-t0:.0f}s]", flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); float(loop(x)); best = min(best, time.perf_counter()-t0)
    ms = best*1000/K
    print(f"{name}: {ms:.3f} ms  ({gflop/ms:.1f} TF/s)", flush=True)

key = jax.random.PRNGKey(0)
# up0: (46,80) 512 -> 256
for (h, w, ci, co, tag) in [(46, 80, 512, 256, "up0"), (92, 160, 256, 128, "up1"),
                            (184, 320, 128, 64, "up2"), (368, 640, 64, 16, "up3")]:
    x = jax.random.uniform(key, (B, h, w, ci), jnp.bfloat16)
    p = deconv_prelu_params(jax.random.PRNGKey(1), 4, ci, co)["conv"]
    gflop = B*h*2*w*2*4*4*ci*co*2/4e9  # k4 s2: each output pixel sums 2x2 taps x ci
    bench(f"deconv {tag} dilated", lambda a, pp: conv_transpose2d(a, pp), x, p, gflop)
    bench(f"deconv {tag} phase", lambda a, pp: _deconv422_phase(a, pp), x, p, gflop)

# down2/down3 convs
for (h, w, ci, co, tag) in [(184, 320, 128, 128, "down2a"), (92, 160, 256, 256, "down3a")]:
    x = jax.random.uniform(key, (B, h, w, ci), jnp.bfloat16)
    p = conv_prelu_params(jax.random.PRNGKey(1), 3, 3, ci, co)["conv"]
    gflop = B*(h//2)*(w//2)*9*ci*co*2/1e9
    bench(f"conv {tag} s2", lambda a, pp: conv2d(a, pp, stride=2), x, p, gflop)
print("done", flush=True)
