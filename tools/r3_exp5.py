"""Round-3 experiment 5 (TPU): arbitrate the residual v4-vs-v5 hardware
mismatch.  Compare BOTH kernels against exact XLA at the divergent
shapes, check v5 run-to-run determinism (a window-DMA race would be
nondeterministic), and localize mismatch positions."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
import numpy as np

from rife_tpu.ops import resize_bilinear
from rife_tpu.ops.warp import warp_xla
from rife_tpu.ops.pallas.warp import warp_pallas
from rife_tpu.ops.pallas.warp_v4 import warp_pallas_v4
from rife_tpu.ops.pallas.warp_v5 import warp_pallas_v5

print("backend:", jax.default_backend(), flush=True)

B, H, W = 4, 736, 1280
coarse = jax.random.normal(jax.random.PRNGKey(2), (B, H // 32, W // 32, 2),
                           jnp.float32) * 3

cases = [
    ("img 3ch 736x1280 b4", (B, H, W, 3), 1.0),
    ("feat 32ch 184x320 b8", (2 * B, H // 4, W // 4, 32), 0.25),
]

for name, shape, fscale in cases:
    n, hh, ww, c = shape
    img = jax.random.uniform(jax.random.PRNGKey(5), shape, jnp.bfloat16)
    fl = resize_bilinear(coarse[:1].repeat(n, 0), (hh, ww)).astype(jnp.float32) * fscale
    ref = np.asarray(warp_xla(img, fl).astype(jnp.float32))
    base_fn = warp_pallas if c < 8 else warp_pallas_v4
    cur = np.asarray(base_fn(img, fl).astype(jnp.float32))
    v5a = np.asarray(warp_pallas_v5(img, fl).astype(jnp.float32))
    v5b = np.asarray(warp_pallas_v5(img + 0, fl + 0).astype(jnp.float32))
    print(f"{name}:", flush=True)
    print(f"  cur vs xla: max {np.abs(cur-ref).max():.5f} frac>1e-2 {(np.abs(cur-ref)>1e-2).mean():.2e}")
    print(f"  v5  vs xla: max {np.abs(v5a-ref).max():.5f} frac>1e-2 {(np.abs(v5a-ref)>1e-2).mean():.2e}")
    print(f"  v5 determinism: max {np.abs(v5a-v5b).max():.5f}")
    bad = np.argwhere(np.abs(v5a - ref).max(-1) > 1e-2)
    if len(bad):
        rows = bad[:, 1]
        print(f"  v5 bad px: {len(bad)}  rows mod 32 histo:",
              np.bincount(rows % 32, minlength=32).tolist(), flush=True)
        print("  sample:", bad[:5].tolist())
    badc = np.argwhere(np.abs(cur - ref).max(-1) > 1e-2)
    print(f"  cur bad px: {len(badc)}", flush=True)

print("done", flush=True)
