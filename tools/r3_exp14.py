"""Exp14 (rewritten): U-Net internals at exact in-graph shapes.

Exp13 measures the whole refine stage's marginal; this decomposes the
U-Net itself (isolated K-chained loops, 720p b4 bf16) so the next
optimization targets the right sub-stage.  Shapes from unet_apply
(models/refine.py:100-121) in the exact 736x1280 batch-4 graph:

  x17 assembly  plane concat (17ch) + from_planes at full res
  down0         17->32 conv s2 + 32->32            @736x1280 -> 368x640
  down1         64->64 s2 + 64->64                 @368x640 -> 184x320
  down2         128->128 s2 + 128->128             @184x320 -> 92x160
  down3         256->256 s2 + 256->256             @92x160 -> 46x80
  up0           512->128 deconv k4s2               -> 92x160
  up1           256->64                            -> 184x320
  up2           128->32                            -> 368x640
  up3           64->16                             -> 736x1280
  finale        16->3 conv + sigmoid               @736x1280
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from jax import lax
from rife_tpu.models.registry import MODEL_REGISTRY
from rife_tpu.models.refine import _conv2_apply
from rife_tpu.nn import conv_transpose2d, prelu, conv2d
from rife_tpu.ops import from_planes

print("backend:", jax.default_backend(), flush=True)
B, H, W, K = 4, 736, 1280, 30
d = MODEL_REGISTRY["rife"]
params = d.init(jax.random.PRNGKey(0), d.config)
U = params["unet"]
key = jax.random.PRNGKey(0)


def bench(name, fn, x, reps=3):
    @jax.jit
    def loop(x):
        def body(i, a):
            return a + jnp.mean(fn(a)).astype(a.dtype)
        return jnp.mean(lax.fori_loop(0, K, body, x))
    t0 = time.perf_counter(); float(loop(x))
    c = time.perf_counter() - t0
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter(); float(loop(x))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1000/K:.2f} ms  (compile {c:.0f}s)", flush=True)


def rnd(shape):
    return jax.random.uniform(key, shape, jnp.bfloat16)


# x17 assembly: 17ch plane tensor -> NHWC (the one relayout the model pays)
x17_pl = rnd((B, 17, H, W))
bench("x17 from_planes", lambda a: from_planes(a) * 1.0, x17_pl)

bench("down0 17->32 s2 @720p",
      lambda a: _conv2_apply(U["down0"], a, stride=2), rnd((B, H, W, 17)))
bench("down1 64->64 s2", lambda a: _conv2_apply(U["down1"], a),
      rnd((B, H // 2, W // 2, 64)))
bench("down2 128->128 s2", lambda a: _conv2_apply(U["down2"], a),
      rnd((B, H // 4, W // 4, 128)))
bench("down3 256->256 s2", lambda a: _conv2_apply(U["down3"], a),
      rnd((B, H // 8, W // 8, 256)))
bench("up0 512->128 k4s2",
      lambda a: prelu(conv_transpose2d(a, U["up0"]["conv"]), U["up0"]["alpha"]),
      rnd((B, H // 16, W // 16, 512)))
bench("up1 256->64",
      lambda a: prelu(conv_transpose2d(a, U["up1"]["conv"]), U["up1"]["alpha"]),
      rnd((B, H // 8, W // 8, 256)))
bench("up2 128->32",
      lambda a: prelu(conv_transpose2d(a, U["up2"]["conv"]), U["up2"]["alpha"]),
      rnd((B, H // 4, W // 4, 128)))
bench("up3 64->16",
      lambda a: prelu(conv_transpose2d(a, U["up3"]["conv"]), U["up3"]["alpha"]),
      rnd((B, H // 2, W // 2, 64)))
bench("finale 16->3 conv+sigmoid",
      lambda a: jax.nn.sigmoid(conv2d(a, U["conv"])), rnd((B, H, W, 16)))
print("done", flush=True)
