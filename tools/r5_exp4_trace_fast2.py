"""r5 exp4: device trace of the fast-rung-2 graph (fast_level0 +
fast_refine, trained weights, pan32 input) — pick the next ladder rung
from data (VERDICT r4 next #1/#6): where do the 39.7 ms/iter go?
"""
import collections
import glob
import gzip
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import dataclasses

import jax, jax.numpy as jnp
import numpy as np
from jax import lax

from rife_tpu.engine.checkpoint import load_checkpoint
from rife_tpu.models.registry import MODEL_REGISTRY
from rife_tpu.ops import use_warp_impl
from rife_tpu.ops.warp import _FUSE_BLEND

_FUSE_BLEND.set(False)
print("backend:", jax.default_backend(), flush=True)
B, H, W, K = 4, 736, 1280, 20
d = MODEL_REGISTRY["rife"]
d = dataclasses.replace(d, config=dataclasses.replace(
    d.config, fast_level0=True, fast_refine=True))
ck = os.path.join(os.path.dirname(__file__), "..", "train_log_r4",
                  "flownet.rtpu")
_, params = load_checkpoint(ck)


def smooth_pair(shift=32, seed=7):
    rng = np.random.default_rng(seed)
    m = 128
    base = rng.random((B, H + m + 128, W + m + 128, 3)).astype(np.float32)
    for _ in range(3):
        base = (base + np.roll(base, 1, 1) + np.roll(base, 1, 2)
                + np.roll(base, 2, 1) + np.roll(base, 2, 2)) / 5
    a = base[:, m:m + H, m:m + W]
    b = base[:, m + shift:m + shift + H, m + shift:m + shift + W]
    return (jnp.asarray(a, jnp.bfloat16), jnp.asarray(b, jnp.bfloat16))


img0, img1 = smooth_pair()

with use_warp_impl("pallas"):
    @jax.jit
    def loop(p, a, b):
        def body(i, a_):
            out = d.apply(p, a_, b, scale_list=d.scale_list, cfg=d.config)
            return out["merged"][-1]
        return jnp.mean(lax.fori_loop(0, K, body, a))

    t0 = time.perf_counter(); float(loop(params, img0, img1))
    print(f"compile {time.perf_counter()-t0:.0f}s", flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); float(loop(params, img0, img1))
        best = min(best, time.perf_counter() - t0)
    print(f"{best*1000/K:.2f} ms/iter ({B*K/best:.1f} fps/chip)", flush=True)
    logdir = "/tmp/rife_trace_fast2"
    jax.profiler.start_trace(logdir)
    float(loop(params, img0, img1))
    jax.profiler.stop_trace()

tr = sorted(glob.glob(logdir + "/**/*.trace.json.gz", recursive=True))[-1]
with gzip.open(tr) as f:
    data = json.load(f)
cat = collections.Counter()
catn = collections.Counter()
names = collections.Counter()
src = collections.Counter()
for e in data["traceEvents"]:
    if e.get("ph") == "X" and e.get("tid") == 3 and e["name"] != "while":
        n = e["name"]
        if n.startswith("while"):
            continue
        base = re.sub(r"[.\d]+$", "", n)
        cat[base] += e.get("dur", 0)
        catn[base] += 1
        names[n] += e.get("dur", 0)
        meta = (e.get("args") or {}).get("source_file") or ""
        src[os.path.basename(meta) or "?"] += e.get("dur", 0)
print("per-iteration ms by category:", flush=True)
tot = 0
for nm, t in cat.most_common(20):
    print(f"  {t/K/1e3:7.3f}  x{catn[nm]//K:4d}  {nm[:60]}", flush=True)
    tot += t
print(f"sum {tot/K/1e3:.2f} ms/iter", flush=True)
print("by source file:", flush=True)
for nm, t in src.most_common(12):
    print(f"  {t/K/1e3:7.3f}  {nm}", flush=True)
print("top individual ops:", flush=True)
for nm, t in names.most_common(30):
    print(f"  {t/K/1e3:7.3f}  {nm[:70]}", flush=True)
print("done", flush=True)
