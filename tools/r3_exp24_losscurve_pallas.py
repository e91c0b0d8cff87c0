"""Exp24: overfit convergence with the kernel-grad Pallas backward.

Same synthetic 300-step run as exp17 (XLA warps: 0.674 -> 0.081 at
288 ms/step).  If the curve matches, the Pallas path (124.2 ms/step,
exp23) is safe to make the training default.
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from rife_tpu.models.registry import MODEL_REGISTRY
from rife_tpu.ops import use_warp_impl
from rife_tpu.train.loop import train_init, make_train_step

print("backend:", jax.default_backend(), flush=True)
d = MODEL_REGISTRY["rife"]
key = jax.random.PRNGKey(7)
n_data = 8
base = jax.random.uniform(key, (n_data, 224, 224, 3), jnp.float32)
shift = jax.random.uniform(jax.random.PRNGKey(8), (n_data, 1, 1, 3)) * 0.2
data0 = jnp.clip(base, 0, 1)
data1 = jnp.clip(base + shift, 0, 1)
gt = jnp.clip(base + 0.5 * shift, 0, 1)

with use_warp_impl("pallas"):
    state, tx, _sched = train_init(d, total_steps=400)
    step_fn = make_train_step(d, tx, compute_dtype=jnp.bfloat16)
    batch = {"img0": jnp.tile(data0, (2, 1, 1, 1)),
             "img1": jnp.tile(data1, (2, 1, 1, 1)),
             "gt": jnp.tile(gt, (2, 1, 1, 1))}
    t0 = time.perf_counter()
    state, metrics = step_fn(state, batch)
    jax.block_until_ready(metrics)
    print(f"compile {time.perf_counter()-t0:.0f}s", flush=True)
    losses = []
    t0 = time.perf_counter()
    for i in range(1, 301):
        state, metrics = step_fn(state, batch)
        if i % 25 == 0 or i == 1:
            l = float(metrics["loss"])
            losses.append((i, round(l, 5)))
            print(f"step {i}: loss {l:.5f}", flush=True)
    jax.block_until_ready(state.params)
    dt = time.perf_counter() - t0
print(f"300 steps wall {dt:.1f}s ({dt/300*1000:.0f} ms/step incl dispatch)",
      flush=True)
print("loss curve:", losses, flush=True)
print("done", flush=True)
