"""Exp38: re-trace the exact graph after the round-3b glue changes.

Re-derives the category budget of r3_exp25/PERFORMANCE.md ("The TRUE
budget") on the current graph (plane_down_int level-0 input, plane-API
call sites) so the next optimization target is picked from data — the
12.8 ms/iter 'layout copies' category (168 copies, mostly tiled-conv
halo assembly + conv-input relayouts) is the remaining known gap.
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
import jax, jax.numpy as jnp
from jax import lax

from rife_tpu.models.registry import MODEL_REGISTRY
from rife_tpu.ops import use_warp_impl

print("backend:", jax.default_backend(), flush=True)
B, H, W, K = 4, 736, 1280, 20
d = MODEL_REGISTRY["rife"]
params = d.init(jax.random.PRNGKey(0), d.config)
img0 = jax.random.uniform(jax.random.PRNGKey(1), (B, H, W, 3), jnp.bfloat16)
img1 = jax.random.uniform(jax.random.PRNGKey(2), (B, H, W, 3), jnp.bfloat16)

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
    logdir = "/tmp/rife_trace2"
    jax.profiler.start_trace(logdir)
    float(loop(params, img0, img1))
    jax.profiler.stop_trace()

tr = sorted(glob.glob(logdir + "/**/*.trace.json.gz", recursive=True))[-1]
with gzip.open(tr) as f:
    data = json.load(f)
cat = collections.Counter()
catn = collections.Counter()
names = collections.Counter()
for e in data["traceEvents"]:
    if e.get("ph") == "X" and e.get("tid") == 3 and e["name"] != "while":
        n = e["name"]
        if n.startswith("while"):
            continue
        base = re.sub(r"[.\d]+$", "", n)
        cat[base] += e.get("dur", 0)
        catn[base] += 1
        names[n] += e.get("dur", 0)
print("per-iteration ms by category:", flush=True)
tot = 0
for nm, t in cat.most_common(20):
    print(f"  {t/K/1e3:7.3f}  x{catn[nm]//K:4d}  {nm[:60]}", flush=True)
    tot += t
print(f"sum {tot/K/1e3:.2f} ms/iter", flush=True)
print("top individual ops:", flush=True)
for nm, t in names.most_common(25):
    print(f"  {t/K/1e3:7.3f}  {nm[:70]}", flush=True)
print("done", flush=True)
