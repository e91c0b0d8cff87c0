"""r5 exp1: qualified-approximation ladder + honest headline inputs
(VERDICT r4 next #1 and #3).

Measures, at the headline config (720p = 736x1280, b4, bf16, pallas):

  rife exact        control
  rife fast rung1   fast_level0 (the r4 default, 75.4 fps at r3)
  rife fast rung2   fast_level0 + fast_refine (half-res ctx+unet)
  rife refine-only  fast_refine alone (attribution)
  v4.25 fast        packed stems (79.4 fps at r3, fresh number)

Each graph compiles ONCE; then it is timed with random-init weights on
noise AND (rife only) the trained train_log_r4 checkpoint on noise and
on synthetic pans of +-8/+-32/+-96 px — the flow-amplitude sensitivity
row VERDICT r4 weak #3 asks for (Pallas warp cost is flow-dependent:
window escapes rise with |flow|).
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from rife_tpu.engine.checkpoint import load_checkpoint
from rife_tpu.models.registry import MODEL_REGISTRY
from rife_tpu.ops import use_warp_impl
from rife_tpu.ops.warp import _FUSE_BLEND

# measure the adopted configuration: composed warp+blend (the fused
# epilogue failed its >2% full-graph A/B — PERFORMANCE.md negatives)
_FUSE_BLEND.set(False)

print("backend:", jax.default_backend(), flush=True)
B, K = 4, 20
H, W = 736, 1280


def smooth_pair(shift: int, seed: int = 7):
    """Textured smooth content panned by `shift` px (both axes).
    Margin must cover 128 + max shift (96) on each axis — the r5 first
    run under-padded and produced a 704-row crop at shift 96."""
    rng = np.random.default_rng(seed)
    m = 128
    base = rng.random((B, H + m + 128, W + m + 128, 3)).astype(np.float32)
    for _ in range(3):
        base = (base + np.roll(base, 1, 1) + np.roll(base, 1, 2)
                + np.roll(base, 2, 1) + np.roll(base, 2, 2)) / 5
    a = base[:, m:m + H, m:m + W]
    b = base[:, m + shift:m + shift + H, m + shift:m + shift + W]
    return (jnp.asarray(a, jnp.bfloat16), jnp.asarray(b, jnp.bfloat16))


def main():
    rife = MODEL_REGISTRY["rife"]
    v425 = MODEL_REGISTRY["v4.25"]

    def cfgd(d, **kw):
        return dataclasses.replace(d, config=dataclasses.replace(d.config, **kw))

    configs = [
        ("rife-exact", rife, (736, 1280)),
        ("rife-fast1", cfgd(rife, fast_level0=True), (736, 1280)),
        ("rife-fast2", cfgd(rife, fast_level0=True, fast_refine=True),
         (736, 1280)),
        ("rife-fast3", dataclasses.replace(
            cfgd(rife, fast_level0=True, fast_refine=True),
            scale_list=(4.0, 2.0, 2.0)), (736, 1280)),
        ("rife-fast4", dataclasses.replace(
            cfgd(rife, fast_level0=True, refine=False),
            scale_list=(4.0, 2.0, 2.0)), (736, 1280)),
        ("rife-refineonly", cfgd(rife, fast_refine=True), (736, 1280)),
        ("v425-fast", cfgd(v425, fast_level0=True), (768, 1280)),
    ]
    if len(sys.argv) > 1:  # resume: pick configs by name
        want = set(sys.argv[1:])
        configs = [c for c in configs if c[0] in want]
        print("running configs:", [c[0] for c in configs], flush=True)

    rand = {n: d.init(jax.random.PRNGKey(0), d.config)
            for n, d, _ in configs}
    trained = None
    for d_ in ("train_log_r5", "train_log_r4"):
        ck = os.path.join(os.path.dirname(__file__), "..", d_, "flownet.rtpu")
        if os.path.exists(ck):
            name, trained = load_checkpoint(ck)
            print("trained checkpoint:", d_, name, flush=True)
            break

    pairs = {"noise": (jax.random.uniform(jax.random.PRNGKey(1), (B, H, W, 3),
                                          jnp.bfloat16),
                       jax.random.uniform(jax.random.PRNGKey(2), (B, H, W, 3),
                                          jnp.bfloat16)),
             "pan8": smooth_pair(8), "pan32": smooth_pair(32),
             "pan96": smooth_pair(96)}

    for cname, d, (h, w) in configs:
        with use_warp_impl("pallas"):
            @jax.jit
            def loop(p, a, b):
                def body(i, a_):
                    out = d.apply(p, a_, b, scale_list=d.scale_list,
                                  cfg=d.config)
                    return out["merged"][-1]
                return jnp.mean(lax.fori_loop(0, K, body, a))

            weight_sets = [("rand", rand[cname])]
            if trained is not None and cname.startswith("rife"):
                weight_sets.append(("trained", trained))
            first = True
            for wname, params in weight_sets:
                for iname, (a, b) in pairs.items():
                    if (h, w) != (H, W):
                        a = jnp.pad(a, ((0, 0), (0, h - H), (0, 0), (0, 0)))
                        b = jnp.pad(b, ((0, 0), (0, h - H), (0, 0), (0, 0)))
                    if wname == "rand" and iname != "noise":
                        continue  # random-init flows are ~0 on any input
                    if first:
                        t0 = time.perf_counter()
                        float(loop(params, a, b))
                        print(f"{cname}: compile {time.perf_counter()-t0:.0f}s",
                              flush=True)
                        first = False
                    best = 1e9
                    for _ in range(3):
                        t0 = time.perf_counter()
                        float(loop(params, a, b))
                        best = min(best, time.perf_counter() - t0)
                    ms = best * 1000 / K
                    print(f"{cname} [{wname}/{iname}]: {ms:.2f} ms/iter "
                          f"({B / ms * 1000:.1f} fps/chip)", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
