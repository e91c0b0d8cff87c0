"""Exp40: XLA flag probe on the exact graph.

The trace (r3_exp38) shows 12.6 ms/iter of synchronous layout copies
(XLA layout-assignment inserts a full-tensor relayout between each
tiled boundary conv's halo assembly and the conv itself) plus 5.3 ms of
compare_selects.  Probe whether scheduler/VMEM flags move any of it:

- latency-hiding scheduler: may overlap the big copies with the Pallas
  warp calls.
- scoped VMEM limit: larger fusion budget -> fewer materializations.

Each variant runs in a subprocess with its own XLA_FLAGS (flags are
read at backend init).
"""
import os
import subprocess
import sys

BODY = r"""
import os, sys, time
sys.path.insert(0, os.getcwd())
import jax, jax.numpy as jnp
from jax import lax
from rife_tpu.models.registry import MODEL_REGISTRY
from rife_tpu.ops import use_warp_impl
K = 20
B, H, W = 4, 736, 1280
d = MODEL_REGISTRY["rife"]
params = d.init(jax.random.PRNGKey(0), d.config)
img0 = jax.random.uniform(jax.random.PRNGKey(0), (B, H, W, 3), jnp.bfloat16)
img1 = jax.random.uniform(jax.random.PRNGKey(1), (B, H, W, 3), jnp.bfloat16)
with use_warp_impl("pallas"):
    @jax.jit
    def loop(params, a, b):
        def body(i, a):
            out = d.apply(params, a, b, scale_list=d.scale_list, cfg=d.config)
            return out["merged"][-1]
        return jnp.mean(lax.fori_loop(0, K, body, a))
    t0 = time.perf_counter(); float(loop(params, img0, img1))
    comp = time.perf_counter() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); float(loop(params, img0, img1))
        best = min(best, time.perf_counter() - t0)
print(f"RESULT {best*1000/K:.2f} ms/iter ({B*K/best:.1f} fps/chip) compile {comp:.0f}s",
      flush=True)
"""

VARIANTS = {
    "latency-hiding sched": "--xla_tpu_enable_latency_hiding_scheduler=true",
    "scoped-vmem 65536": "--xla_tpu_scoped_vmem_limit_kib=65536",
    "both": ("--xla_tpu_enable_latency_hiding_scheduler=true "
             "--xla_tpu_scoped_vmem_limit_kib=65536"),
}

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))  # repo root
for name, flags in VARIANTS.items():
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + flags).strip()
    r = subprocess.run([sys.executable, "-u", "-c", BODY], env=env, cwd=here,
                       capture_output=True, text=True, timeout=3000)
    out = [l for l in r.stdout.splitlines() if l.startswith("RESULT")]
    print(f"{name}: {out[0][7:] if out else 'FAILED'}", flush=True)
    if not out:
        tail = (r.stdout + r.stderr).strip().splitlines()[-5:]
        for l in tail:
            print("   !", l[:160], flush=True)
print("done", flush=True)
