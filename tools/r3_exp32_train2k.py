"""Exp32: 2000-step bf16 training run with the kernel-grad backward.

Longer-horizon stability check of the new TPU training default
(pallas impl): loss trajectory over 2000 steps on synthetic shifted
textures + student PSNR before/after, chained in 100-step jit blocks
so dispatch overhead stays negligible.
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from jax import lax
from rife_tpu.models.registry import MODEL_REGISTRY
from rife_tpu.ops import use_warp_impl
from rife_tpu.train.loop import train_init, make_train_step

print("backend:", jax.default_backend(), flush=True)
d = MODEL_REGISTRY["rife"]
key = jax.random.PRNGKey(7)
n_data = 16
base = jax.random.uniform(key, (n_data, 224, 224, 3), jnp.float32)
shift = jax.random.uniform(jax.random.PRNGKey(8), (n_data, 1, 1, 3)) * 0.2
batch = {"img0": jnp.clip(base, 0, 1),
         "img1": jnp.clip(base + shift, 0, 1),
         "gt": jnp.clip(base + 0.5 * shift, 0, 1)}


def psnr(pred, gt):
    mse = jnp.mean((pred - gt) ** 2)
    return -10 * jnp.log10(mse)


with use_warp_impl("pallas"):
    state, tx, _ = train_init(d, total_steps=2200)
    step_fn = make_train_step(d, tx, compute_dtype=jnp.bfloat16)

    @jax.jit
    def block100(state, batch):
        def body(i, st):
            st, _ = step_fn(st, batch)
            return st
        st = lax.fori_loop(0, 100, body, state)
        _, metrics = step_fn(st, batch)
        return st, metrics["loss"]

    @jax.jit
    def eval_psnr(params, batch):
        out = d.apply(params, batch["img0"], batch["img1"],
                      scale_list=d.scale_list, cfg=d.config)
        return psnr(out["merged"][-1], batch["gt"])

    p0 = float(eval_psnr(state.params, batch))
    print(f"initial student PSNR: {p0:.2f} dB", flush=True)
    t0 = time.perf_counter()
    for blk in range(20):
        state, loss = block100(state, batch)
        print(f"step {(blk + 1) * 100}: loss {float(loss):.5f}", flush=True)
    dt = time.perf_counter() - t0
    p1 = float(eval_psnr(state.params, batch))
    print(f"2000 steps wall {dt:.0f}s ({dt / 2000 * 1e3:.0f} ms/step "
          f"incl per-block dispatch)", flush=True)
    print(f"final student PSNR: {p1:.2f} dB  (delta {p1 - p0:+.2f})", flush=True)
print("done", flush=True)
