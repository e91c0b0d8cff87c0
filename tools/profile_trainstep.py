"""Train-step time: XLA warp vs Pallas-forward warp (custom VJP).

Reference config: batch 16, 224x224 crops (train.py:49, dataset.py:73).
K-chained steps in one jit; scalar fetch.
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/rife_tpu_jit_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from jax import lax
from rife_tpu.models.registry import MODEL_REGISTRY
from rife_tpu.ops import use_warp_impl
from rife_tpu.train import train_init, make_train_step

K = 10
B, HW = 16, 224
d = MODEL_REGISTRY["rife"]
state, tx, _ = train_init(d, total_steps=1000)
key = jax.random.PRNGKey(0)
batch = {
    "img0": jax.random.uniform(key, (B, HW, HW, 3), jnp.float32),
    "img1": jax.random.uniform(jax.random.PRNGKey(1), (B, HW, HW, 3), jnp.float32),
    "gt": jax.random.uniform(jax.random.PRNGKey(2), (B, HW, HW, 3), jnp.float32),
    "timestep": jnp.full((B,), 0.5, jnp.float32),
}

def bench(name, impl):
    with use_warp_impl(impl):
        step = make_train_step(d, tx)

        @jax.jit
        def loop(st, b):
            def body(i, st):
                st2, _ = step(st, b)
                return st2
            return lax.fori_loop(0, K, body, st).params["block0"]["conv0"][0]["conv"]["w"].sum()
        t0 = time.perf_counter(); float(loop(state, batch))
        print(f"  [{name} compile {time.perf_counter()-t0:.0f}s]", flush=True)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter(); float(loop(state, batch)); best = min(best, time.perf_counter()-t0)
        print(f"train step ({name}): {best*1000/K:.2f} ms/step", flush=True)

bench("xla warp", "xla")
bench("pallas fwd + xla vjp", "pallas")
print("done", flush=True)
