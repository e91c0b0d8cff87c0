"""Exp26: dump the optimized HLO of the exact graph to attribute the
trace's copy/fusion costs (exp25) to tensors.

Builds the identical jit as exp25 (same shapes/K) so instruction names
match the trace, compiles WITHOUT running, and writes the HLO text.
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from jax import lax
from rife_tpu.models.registry import MODEL_REGISTRY
from rife_tpu.ops import use_warp_impl

print("backend:", jax.default_backend(), flush=True)
B, H, W, K = 4, 736, 1280, 20
d = MODEL_REGISTRY["rife"]
params = d.init(jax.random.PRNGKey(0), d.config)
img0 = jax.random.uniform(jax.random.PRNGKey(1), (B, H, W, 3), jnp.bfloat16)
img1 = jax.random.uniform(jax.random.PRNGKey(2), (B, H, W, 3), jnp.bfloat16)

with use_warp_impl("pallas"):
    @jax.jit
    def loop(p, a, b):
        def body(i, a_):
            out = d.apply(p, a_, b, scale_list=d.scale_list, cfg=d.config)
            return out["merged"][-1]
        return jnp.mean(lax.fori_loop(0, K, body, a))

    t0 = time.perf_counter()
    compiled = loop.lower(params, img0, img1).compile()
    print(f"compile {time.perf_counter()-t0:.0f}s", flush=True)
    txt = compiled.as_text()
    with open("/tmp/rife_hlo.txt", "w") as f:
        f.write(txt)
    print(f"HLO written: {len(txt)/1e6:.1f} MB", flush=True)
print("done", flush=True)
