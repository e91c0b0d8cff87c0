"""Exp25: attempt a real profiler trace of the exact 720p graph.

All stage budgets so far come from chained ablations (compile-heavy,
marginal-cost semantics).  If jax.profiler works over the axon tunnel,
the device trace gives the true op timeline of the 58.8 ms iter —
revealing scheduling bubbles the ablations cannot see.  If the
platform doesn't support it, record the failure mode here.
"""
import os, sys, time, glob
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

    t0 = time.perf_counter(); float(loop(params, img0, img1))
    print(f"compile {time.perf_counter()-t0:.0f}s", flush=True)
    logdir = "/tmp/rife_trace"
    try:
        jax.profiler.start_trace(logdir)
        float(loop(params, img0, img1))
        jax.profiler.stop_trace()
        files = glob.glob(logdir + "/**/*", recursive=True)
        total = sum(os.path.getsize(f) for f in files if os.path.isfile(f))
        print(f"trace ok: {len(files)} files, {total/1e6:.1f} MB", flush=True)
        for f in sorted(files)[-10:]:
            if os.path.isfile(f):
                print("  ", f, os.path.getsize(f), flush=True)
    except Exception as e:
        print(f"trace FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)
print("done", flush=True)
