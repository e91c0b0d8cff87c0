"""Exp11: in-model ablation deltas + batch scaling + TPU loss curve.

Isolated stage probes disagree with the full-graph sum (XLA overlaps
stages), so measure each stage's true marginal cost by replacing it
with a cheap fake inside the FULL exact graph:

1. full exact (baseline, post ty_min-prep tweak)
2. full with noop image warps (student warp2_planes -> roll)
3. full with noop feature warps (refine warp_planes -> identity)
4. full with both noop
5. full exact at batch 8
6. 300-step overfit loss curve on the real chip (VERDICT #5)
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from jax import lax
from rife_tpu.models.registry import MODEL_REGISTRY
from rife_tpu.ops import use_warp_impl
import rife_tpu.models.ifnet as ifnet_mod
import rife_tpu.models.refine as refine_mod

print("backend:", jax.default_backend(), flush=True)
B, H, W, K = 4, 736, 1280, 20
d = MODEL_REGISTRY["rife"]
params = d.init(jax.random.PRNGKey(0), d.config)
img0 = jax.random.uniform(jax.random.PRNGKey(0), (B, H, W, 3), jnp.bfloat16)
img1 = jax.random.uniform(jax.random.PRNGKey(1), (B, H, W, 3), jnp.bfloat16)


def bench(name, fn, *args, reps=3, iters=K):
    t0 = time.perf_counter(); float(fn(*args))
    c = time.perf_counter() - t0
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    n = args[1].shape[0] if len(args) > 1 else B
    print(f"{name}: {best*1000/iters:.2f} ms/iter  "
          f"({n*iters/best:.1f} fps)  (compile {c:.0f}s)", flush=True)


def full_fn():
    @jax.jit
    def full(p, a, b):
        def body(i, x):
            return d.apply(p, x, b, scale_list=d.scale_list,
                           cfg=d.config)["merged"][-1]
        return jnp.mean(lax.fori_loop(0, K, body, a))
    return full


def fake_w2(i0, i1, f0, f1):
    r = jnp.roll(i0, 1, axis=2) + 0 * f0[:, :1].astype(i0.dtype)
    s = jnp.roll(i1, 1, axis=2) + 0 * f1[:, :1].astype(i1.dtype)
    return r, s


with use_warp_impl("pallas"):
    bench("full exact", full_fn(), params, img0, img1)

    saved = ifnet_mod.warp2_planes
    ifnet_mod.warp2_planes = fake_w2
    bench("full, noop image warps", full_fn(), params, img0, img1)
    ifnet_mod.warp2_planes = saved

    saved_f = refine_mod.warp_planes
    refine_mod.warp_planes = lambda im, fl: im + 0 * fl[:, :1].astype(im.dtype)
    bench("full, noop feature warps", full_fn(), params, img0, img1)

    ifnet_mod.warp2_planes = fake_w2
    bench("full, noop all warps", full_fn(), params, img0, img1)
    ifnet_mod.warp2_planes = saved
    refine_mod.warp_planes = saved_f

    img0b = jnp.concatenate([img0, img0], 0)
    img1b = jnp.concatenate([img1, img1], 0)
    bench("full exact b8", full_fn(), params, img0b, img1b)

# 6. TPU loss curve: overfit 8 synthetic 224x224 triplets, bf16, b16
# (the reference config: batch 16, 224^2 crops — train.py:49, dataset.py:73)
from rife_tpu.train.loop import train_init, make_train_step
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
