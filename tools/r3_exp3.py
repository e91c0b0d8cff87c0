"""Round-3 experiment batch 3 (TPU): verify warp v5 against v3/v4 on
real hardware at the model shapes (same smooth flows), then measure the
full-model headline fps with v5 dispatched (a) for features only and
(b) everywhere, by patching warp_pallas_auto before trace."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from jax import lax

from rife_tpu.ops import resize_bilinear
from rife_tpu.ops.pallas import warp as pw
from rife_tpu.ops.pallas.warp import warp_pallas
from rife_tpu.ops.pallas.warp_v4 import warp_pallas_v4
from rife_tpu.ops.pallas.warp_v5 import warp_pallas_v5

print("backend:", jax.default_backend(), flush=True)

B, H, W = 4, 736, 1280
coarse = jax.random.normal(jax.random.PRNGKey(2), (B, H // 32, W // 32, 2),
                           jnp.float32) * 3

cases = [
    ("img 3ch 736x1280 b4", (B, H, W, 3), 1.0),
    ("feat 16ch 368x640 b8", (2 * B, H // 2, W // 2, 16), 0.5),
    ("feat 32ch 184x320 b8", (2 * B, H // 4, W // 4, 32), 0.25),
    ("feat 64ch 92x160 b8", (2 * B, H // 8, W // 8, 64), 0.125),
    ("feat 128ch 46x80 b8", (2 * B, H // 16, W // 16, 128), 0.0625),
]

# ---- on-hardware equivalence: v5 vs the currently-dispatched kernel ----
for name, shape, fscale in cases:
    n, hh, ww, c = shape
    img = jax.random.uniform(jax.random.PRNGKey(5), shape, jnp.bfloat16)
    fl = resize_bilinear(coarse[:1].repeat(n, 0), (hh, ww)).astype(jnp.float32) * fscale
    base_fn = warp_pallas if c < 8 else warp_pallas_v4
    try:
        a = base_fn(img, fl).astype(jnp.float32)
        b = warp_pallas_v5(img, fl).astype(jnp.float32)
        d = float(jnp.max(jnp.abs(a - b)))
        frac = float(jnp.mean((jnp.abs(a - b) > 1e-3).astype(jnp.float32)))
        print(f"{name}: max|cur - v5| = {d:.6f}  frac>1e-3 = {frac:.2e}", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:250]}", flush=True)

# ---- full-model fps with v5 patched into the dispatcher ----------------
from rife_tpu.models.registry import MODEL_REGISTRY
from rife_tpu.ops import use_warp_impl

iters = 20
img0 = jax.random.uniform(jax.random.PRNGKey(0), (B, H, W, 3), jnp.bfloat16)
img1 = jax.random.uniform(jax.random.PRNGKey(1), (B, H, W, 3), jnp.bfloat16)
d = MODEL_REGISTRY["rife"]
params = d.init(jax.random.PRNGKey(0), d.config)

orig_auto = pw.warp_pallas_auto


def bench_model(tag):
    with use_warp_impl("pallas"):
        @jax.jit
        def chained(params, a, b):
            def body(i, a):
                out = d.apply(params, a, b, scale_list=d.scale_list, cfg=d.config)
                return out["merged"][-1]
            return jnp.mean(lax.fori_loop(0, iters, body, a))

        t0 = time.perf_counter()
        float(chained(params, img0, img1))
        print(f"{tag}: compile {time.perf_counter()-t0:.0f}s", flush=True)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(chained(params, img0, img1))
            best = min(best, time.perf_counter() - t0)
    fps = B * iters / best
    print(f"{tag}: {best/iters*1e3/B:.2f} ms/frame  {fps:.1f} fps/chip", flush=True)


pw.warp_pallas_auto = lambda img, fl: (
    warp_pallas_v5(img, fl) if img.shape[-1] >= 8 else warp_pallas(img, fl))
bench_model("v5 features only")

pw.warp_pallas_auto = lambda img, fl: warp_pallas_v5(img, fl)
bench_model("v5 everywhere")

print("done", flush=True)
