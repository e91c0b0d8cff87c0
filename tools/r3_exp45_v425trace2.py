"""Exp45: category budget of the NEW v4.25 fast graph (52.1 ms/iter,
76.8 fps) — where does v4.25 go next.  Same harness as r3_exp38.
"""
import collections
import dataclasses
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
B, H, W, K = 4, 768, 1280, 20
d = MODEL_REGISTRY["v4.25"]
cfg = dataclasses.replace(d.config, fast_level0=True)
params = d.init(jax.random.PRNGKey(0), d.config)
img0 = jax.random.uniform(jax.random.PRNGKey(1), (B, H, W, 3), jnp.bfloat16)
img1 = jax.random.uniform(jax.random.PRNGKey(2), (B, H, W, 3), jnp.bfloat16)

with use_warp_impl("pallas"):
    @jax.jit
    def loop(p, a, b):
        def body(i, a_):
            out = d.apply(p, a_, b, scale_list=d.scale_list, cfg=cfg)
            return out["merged"][-1]
        return jnp.mean(lax.fori_loop(0, K, body, a))

    t0 = time.perf_counter(); float(loop(params, img0, img1))
    print(f"compile {time.perf_counter()-t0:.0f}s", flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); float(loop(params, img0, img1))
        best = min(best, time.perf_counter() - t0)
    print(f"{best*1000/K:.2f} ms/iter ({B*K/best:.1f} fps/chip)", flush=True)
    logdir = "/tmp/v425_trace2"
    jax.profiler.start_trace(logdir)
    float(loop(params, img0, img1))
    jax.profiler.stop_trace()

tr = sorted(glob.glob(logdir + "/**/*.trace.json.gz", recursive=True))[-1]
with gzip.open(tr) as f:
    data = json.load(f)
cat = collections.Counter()
catn = collections.Counter()
names = collections.Counter()
args = {}
for e in data["traceEvents"]:
    if e.get("ph") == "X" and e.get("tid") == 3 and e["name"] != "while":
        n = e["name"]
        if n.startswith("while"):
            continue
        base = re.sub(r"[.\d]+$", "", n)
        cat[base] += e.get("dur", 0)
        catn[base] += 1
        names[n] += e.get("dur", 0)
        if n not in args and e.get("args"):
            args[n] = e["args"]
print("per-iteration ms by category:", flush=True)
tot = 0
for nm, t in cat.most_common(20):
    print(f"  {t/K/1e3:7.3f}  x{catn[nm]//K:4d}  {nm[:60]}", flush=True)
    tot += t
print(f"sum {tot/K/1e3:.2f} ms/iter", flush=True)
print("top individual ops (with metadata):", flush=True)
for nm, t in names.most_common(20):
    meta = args.get(nm, {})
    src = str(meta.get("source_info") or meta.get("metadata") or "")[:60]
    shape = str(meta.get("shape", ""))[:40]
    print(f"  {t/K/1e3:7.3f}  {nm[:44]:46s} {shape} {src}", flush=True)
print("done", flush=True)
