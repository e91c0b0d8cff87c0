"""r5 exp3: K-step chained train step on chip (VERDICT r4 next #5).

The r4 training run logged t_train 2.4-5.8 s/step against a 124 ms
device step — all per-invocation dispatch over the tunnel (~0.7 s/call,
CLAUDE.md).  make_train_step_chained runs K optimizer steps inside one
jit over a (K, B, ...) staged super-batch; this measures wall ms/step
at the reference train config (batch 16, 224 crop, bf16, pallas
kernel-grad warps) for K = 1 / 4 / 8.

Run:  python -u tools/r5_exp3_trainchain.py > /tmp/r5/trainchain.log 2>&1
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax

from rife_tpu.models.registry import MODEL_REGISTRY
from rife_tpu.ops import set_warp_impl
from rife_tpu.parallel import (make_mesh, replicated_sharding, shard_batch,
                               shard_superbatch)
from rife_tpu.train import (make_train_step, make_train_step_chained,
                            train_init)

print("backend:", jax.default_backend(), flush=True)
set_warp_impl("pallas" if jax.default_backend() == "tpu" else "xla")

B, CROP = 16, 224
mesh = make_mesh(("data",))
d = MODEL_REGISTRY["rife"]
state0, tx, _ = train_init(d, total_steps=10_000)
state0 = jax.device_put(state0, replicated_sharding(mesh))

rng = np.random.default_rng(0)


def batch(seed):
    r = np.random.default_rng(seed)
    return {
        "img0": r.random((B, CROP, CROP, 3), np.float32),
        "img1": r.random((B, CROP, CROP, 3), np.float32),
        "gt": r.random((B, CROP, CROP, 3), np.float32),
        "timestep": np.full((B,), 0.5, np.float32),
    }


import jax.numpy as jnp

for K in (1, 4, 8):
    if K == 1:
        step = make_train_step(d, tx, mesh=mesh, compute_dtype=jnp.bfloat16)
        payload = shard_batch(batch(0), mesh)
        call = lambda st: step(st, payload)
    else:
        step = make_train_step_chained(d, tx, K, mesh=mesh,
                                       compute_dtype=jnp.bfloat16)
        sb = {k: np.stack([batch(i)[k] for i in range(K)])
              for k in batch(0)}
        payload = shard_superbatch(sb, mesh)
        call = lambda st: step(st, payload)

    t0 = time.perf_counter()
    st, m = call(state0)
    lv = m["loss"] if K == 1 else m["loss"][-1]
    float(lv)
    print(f"K={K}: compile+first {time.perf_counter()-t0:.0f}s", flush=True)
    # steady state: chain a few calls, fetch one scalar per call (the
    # per-call dispatch is exactly what we are measuring, so do NOT
    # fold calls into a bigger jit here)
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        st, m = call(st)
        float(m["loss"] if K == 1 else m["loss"][-1])
        best = min(best, time.perf_counter() - t0)
    print(f"K={K}: wall {best*1000:.0f} ms/call = {best*1000/K:.0f} ms/step "
          f"({B*K/best:.1f} samples/s)", flush=True)
print("done", flush=True)
