"""Exp15: verify the NHWC-routed plane-warp backward fixes the train
step regression (exp12: 1.9 s/step both impls on the plane-major graph
vs 263.9 ms round-2 NHWC graph).

Chained-fori steps, reference config (batch 16, 224^2), as exp12.
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


def run(tag, compute_dtype, impl, fwd_only=False):
    with use_warp_impl(impl):
        try:
            state, tx, _ = train_init(d, total_steps=1000)
            if fwd_only:
                @jax.jit
                def chained(params, batch):
                    def body(i, c):
                        out = _loss_fn(
                            jax.tree.map(lambda p: p + c * 1e-30, params),
                            batch, d, compute_dtype)
                        return out[0] * 1e-20
                    return lax.fori_loop(0, ITERS, body,
                                         jnp.zeros((), jnp.float32))
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
            print(f"{tag}: {best/ITERS*1e3:.1f} ms/step   "
                  f"(compile {comp:.0f}s)", flush=True)
        except Exception as e:
            print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)


run("bf16 step xla nhwc-routed", jnp.bfloat16, "xla")
run("bf16 step pallas-v5 nhwc-bwd", jnp.bfloat16, "pallas")
run("bf16 fwd+loss xla nhwc-routed", jnp.bfloat16, "xla", fwd_only=True)
run("f32 step xla nhwc-routed", jnp.float32, "xla")
print("done", flush=True)
