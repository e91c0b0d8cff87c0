"""Exp36: full exact graph — (a) PReLU as max/min arithmetic instead of
where (the trace bills 5.3 ms/iter of compare_select fusions to conv
padding selects + PReLU wheres; max(x,0) + a*min(x,0) has no compare),
(b) batch 8 after the plane-major rewrite (the b8==b4 result predates
the layout fixes).

Baseline: 57.0 ms/iter b4 (70.2 fps), exp28.
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from jax import lax
from rife_tpu.models.registry import MODEL_REGISTRY
from rife_tpu.nn import layers
from rife_tpu.ops import use_warp_impl

print("backend:", jax.default_backend(), flush=True)
H, W, K = 736, 1280, 20
d = MODEL_REGISTRY["rife"]
params = d.init(jax.random.PRNGKey(0), d.config)

_prelu_where = layers.prelu


def prelu_maxmin(x, alpha):
    a = alpha.astype(x.dtype)
    zero = jnp.zeros((), x.dtype)
    return jnp.maximum(x, zero) + a * jnp.minimum(x, zero)


def bench(name, B, prelu_fn):
    layers.prelu = prelu_fn
    img0 = jax.random.uniform(jax.random.PRNGKey(1), (B, H, W, 3), jnp.bfloat16)
    img1 = jax.random.uniform(jax.random.PRNGKey(2), (B, H, W, 3), jnp.bfloat16)
    with use_warp_impl("pallas"):
        @jax.jit
        def loop(p, a, b):
            def body(i, a_):
                out = d.apply(p, a_, b, scale_list=d.scale_list, cfg=d.config)
                return out["merged"][-1]
            return jnp.mean(lax.fori_loop(0, K, body, a))

        t0 = time.perf_counter(); float(loop(params, img0, img1))
        comp = time.perf_counter() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter(); float(loop(params, img0, img1))
            best = min(best, time.perf_counter() - t0)
    layers.prelu = _prelu_where
    ms = best * 1000 / K
    print(f"{name}: {ms:.2f} ms/iter  ({B / ms * 1000:.1f} fps/chip)  "
          f"(compile {comp:.0f}s)", flush=True)


bench("b4 prelu=where (control)", 4, _prelu_where)
bench("b4 prelu=max/min", 4, prelu_maxmin)
bench("b8 prelu=where", 8, _prelu_where)
print("done", flush=True)
