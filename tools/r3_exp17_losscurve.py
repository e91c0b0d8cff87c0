"""Exp17: 300-step overfit loss curve on the real chip (VERDICT #5).

Reference config (batch 16, 224^2 crops — train.py:49, dataset.py:73),
bf16 compute, synthetic shifted-texture triplets.  Per-step dispatch
over the axon tunnel adds ~0.7 s/call; the convergence curve is the
point here — the honest ms/step number is the chained-loop measurement
in tools/r3_exp15.py (288.6 ms bf16 / 418.7 f32).
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from rife_tpu.models.registry import MODEL_REGISTRY
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

state, tx, _sched = train_init(d, total_steps=400)
step_fn = make_train_step(d, tx, compute_dtype=jnp.bfloat16)
batch = {"img0": jnp.tile(data0, (2, 1, 1, 1)),
         "img1": jnp.tile(data1, (2, 1, 1, 1)),
         "gt": jnp.tile(gt, (2, 1, 1, 1))}
t0 = time.perf_counter()
state, metrics = step_fn(state, batch)
jax.block_until_ready(metrics)
print(f"train step compile {time.perf_counter()-t0:.0f}s", flush=True)
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
