"""Round-3 train-step profile (TPU): where do the 415 ms/step go?

Measures the full jitted train step at the reference config (batch 16,
224x224 crops, /root/reference/train.py:49 + dataset.py:73) under:
  1. f32 activations (current TRAINING.md number)
  2. bf16 activations (--dtype bfloat16 path)
  3. bf16, forward+loss only (no grad) -> bwd cost by subtraction
  4. bf16, warps patched to a static roll (same traffic, no gather in
     fwd / no scatter in bwd) -> warp+scatter cost by subtraction
All chained ITERS inside one jit with a scalar fetch (axon RTT rules,
see CLAUDE.md).
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from jax import lax

import rife_tpu.ops as ops
import rife_tpu.models.ifnet as ifnet_mod
import rife_tpu.models.refine as refine_mod
from rife_tpu.models.registry import MODEL_REGISTRY
from rife_tpu.train.loop import train_init, make_train_step

print("backend:", jax.default_backend(), flush=True)

B, HW = 16, 224
ITERS = 10
d = MODEL_REGISTRY["rife"]
key = jax.random.PRNGKey(0)
batch = {
    "img0": jax.random.uniform(key, (B, HW, HW, 3), jnp.float32),
    "img1": jax.random.uniform(key, (B, HW, HW, 3), jnp.float32),
    "gt": jax.random.uniform(key, (B, HW, HW, 3), jnp.float32),
}


def run(tag, compute_dtype, fwd_only=False, fake_warp=False):
    saved = (ops.warp, ops.warp2, ifnet_mod.warp, ifnet_mod.warp2,
             ifnet_mod.warp2_planes, refine_mod.warp_planes)
    if fake_warp:
        def _w(img, flow):
            return jnp.roll(img, (1, 1), axis=(1, 2)) + 0 * flow[..., :1]
        def _w2(i0, i1, f0, f1):
            return _w(i0, f0), _w(i1, f1)
        def _wp(img, flow):
            return jnp.roll(img, (1, 1), axis=(2, 3)) + 0 * flow[:, :1]
        def _wp2(i0, i1, f0, f1):
            return _wp(i0, f0), _wp(i1, f1)
        ops.warp = _w; ops.warp2 = _w2
        ifnet_mod.warp = _w; ifnet_mod.warp2 = _w2
        ifnet_mod.warp2_planes = _wp2; refine_mod.warp_planes = _wp
    try:
        state, tx, _ = train_init(d, total_steps=1000)
        if fwd_only:
            from rife_tpu.train.loop import _loss_fn

            @jax.jit
            def chained(params, batch):
                def body(i, c):
                    out = _loss_fn(
                        jax.tree.map(lambda p: p + c * 1e-30, params),
                        batch, d, compute_dtype)
                    return out[0] * 1e-20
                return lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))

            args = (state.params, batch)
        else:
            step_fn = make_train_step(d, tx, compute_dtype=compute_dtype)

            @jax.jit
            def chained(state, batch):
                def body(i, st):
                    st, metrics = step_fn(st, batch)
                    return st
                st = lax.fori_loop(0, ITERS, body, state)
                return jax.tree.reduce(
                    lambda a, b: a + jnp.sum(b).astype(jnp.float32),
                    st.params, jnp.zeros((), jnp.float32))

            args = (state, batch)
        t0 = time.perf_counter()
        float(jnp.asarray(chained(*args)).ravel()[0])
        comp = time.perf_counter() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(jnp.asarray(chained(*args)).ravel()[0])
            best = min(best, time.perf_counter() - t0)
        print(f"{tag}: {best/ITERS*1e3:.1f} ms/step   (compile {comp:.0f}s)",
              flush=True)
    except Exception as e:
        print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)
    finally:
        (ops.warp, ops.warp2, ifnet_mod.warp, ifnet_mod.warp2,
         ifnet_mod.warp2_planes, refine_mod.warp_planes) = saved


run("f32 full step", jnp.float32)
run("bf16 full step", jnp.bfloat16)
run("bf16 fwd+loss only", jnp.bfloat16, fwd_only=True)
run("bf16 full step, fake warp", jnp.bfloat16, fake_warp=True)
run("f32 full step, fake warp", jnp.float32, fake_warp=True)
print("done", flush=True)
