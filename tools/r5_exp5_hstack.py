"""r5 exp5: H-stacked tile assembly vs batch-fold for the tiled convs
(VERDICT r4 next #6 — the 12.8 ms/iter layout-copy category).

The trace pins the copy category on XLA relayouting each (n*nt, rows,
W, C) tile batch into the conv's preferred batch-minor layout (~0.61 ms
per copy, docs/PERFORMANCE.md "TRUE budget").  conv2d_tiled_hstack
keeps batch at n and stacks the halo'd tiles along H instead — no tile
batch to relayout; the price is computed-and-discarded boundary rows
plus one garbage-row slice on the dense-channel output.

Full-graph A/B (round-3 lesson: isolated conv probes do NOT transfer —
exp10/exp20/exp37), rife exact + fast rungs at the headline config.

Run:  python -u tools/r5_exp5_hstack.py > /tmp/r5/hstack.log 2>&1
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

from rife_tpu.models.registry import MODEL_REGISTRY
from rife_tpu.nn import layers
from rife_tpu.ops import use_warp_impl

print("backend:", jax.default_backend(), flush=True)
B, K = 4, 20
H, W = 736, 1280


def main():
    rife = MODEL_REGISTRY["rife"]

    def cfgd(d, **kw):
        return dataclasses.replace(d, config=dataclasses.replace(d.config, **kw))

    configs = [
        ("rife-exact", rife),
        ("rife-fast2", cfgd(rife, fast_level0=True, fast_refine=True)),
    ]
    params = {n: d.init(jax.random.PRNGKey(0), d.config) for n, d in configs}
    rng = np.random.default_rng(7)
    base = rng.random((B, H + 160, W + 160, 3), np.float32)
    for _ in range(3):
        base = (base + np.roll(base, 1, 1) + np.roll(base, 1, 2)
                + np.roll(base, 2, 1) + np.roll(base, 2, 2)) / 5
    a = jnp.asarray(base[:, 64:64 + H, 64:64 + W], jnp.bfloat16)
    b = jnp.asarray(base[:, 96:96 + H, 96:96 + W], jnp.bfloat16)

    for cname, d in configs:
        for impl in ("batch", "hstack"):
            layers.set_tiled_conv_impl(impl)
            with use_warp_impl("pallas"):
                @jax.jit
                def loop(p, x, y):
                    def body(i, x_):
                        out = d.apply(p, x_, y, scale_list=d.scale_list,
                                      cfg=d.config)
                        return out["merged"][-1]
                    return jnp.mean(lax.fori_loop(0, K, body, x))

                t0 = time.perf_counter()
                float(loop(params[cname], a, b))
                print(f"{cname}/{impl}: compile {time.perf_counter()-t0:.0f}s",
                      flush=True)
                best = 1e9
                for _ in range(3):
                    t0 = time.perf_counter()
                    float(loop(params[cname], a, b))
                    best = min(best, time.perf_counter() - t0)
                ms = best * 1000 / K
                print(f"{cname}/{impl}: {ms:.2f} ms/iter "
                      f"({B / ms * 1000:.1f} fps/chip)", flush=True)
    layers.set_tiled_conv_impl("batch")
    print("done", flush=True)


if __name__ == "__main__":
    main()
