"""Exp23: train step with the kernel-emitted-gradient VJP.

The plane Pallas warp's custom VJP now takes d/flow from the kernel's
dI/dx, dI/dy outputs (one fwd pass, emit_grads=True) and d/img from the
flow-stopped scatter adjoint — no XLA re-gather in the backward.
Baseline (exp15): 288.6 ms/step bf16 either impl; fwd+loss was 26.3 ms
with the Pallas forward, so the backward holds ~260 ms of XLA gather.

Chained-fori steps, reference config (batch 16, 224^2), as exp15.
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from jax import lax
from rife_tpu.models.registry import MODEL_REGISTRY
from rife_tpu.ops import use_warp_impl
from rife_tpu.train.loop import train_init, make_train_step, _loss_fn

print("backend:", jax.default_backend(), flush=True)
d = MODEL_REGISTRY["rife"]
B, ITERS = 16, 10
batch = {
    "img0": jax.random.uniform(jax.random.PRNGKey(7), (B, 224, 224, 3),
                               jnp.float32),
    "img1": jax.random.uniform(jax.random.PRNGKey(8), (B, 224, 224, 3),
                               jnp.float32),
    "gt": jax.random.uniform(jax.random.PRNGKey(9), (B, 224, 224, 3),
                             jnp.float32),
}


def run(tag, compute_dtype, impl):
    with use_warp_impl(impl):
        try:
            state, tx, _ = train_init(d, total_steps=1000)
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
            t0 = time.perf_counter()
            float(chained(state, batch))
            comp = time.perf_counter() - t0
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                float(chained(state, batch))
                best = min(best, time.perf_counter() - t0)
            print(f"{tag}: {best/ITERS*1e3:.1f} ms/step   "
                  f"(compile {comp:.0f}s)", flush=True)
        except Exception as e:
            print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)


run("bf16 step pallas kernel-grad bwd", jnp.bfloat16, "pallas")
run("f32 step pallas kernel-grad bwd", jnp.float32, "pallas")
print("done", flush=True)
