"""Exp16: lowering sweep for the U-Net boundary stages exp14 flagged.

exp14 (isolated, b4 bf16): down0 3.48, down1 3.47, up2 2.09, up3 3.05,
finale 2.39 — all 2.5-6x off their compute+traffic floors while the
inner stages (down2..up1) sit at ceiling.  down1 (64->64 s2 @368x640,
0.55 ms floor) is the worst.  Sweep H-tiling on/off and a stride-1+
reshape alternative for the s2 convs.
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from jax import lax
from rife_tpu.models.registry import MODEL_REGISTRY
from rife_tpu.models.refine import _conv2_apply
from rife_tpu.nn import conv_transpose2d, prelu, conv2d, conv_prelu
from rife_tpu.nn.layers import use_conv_tiling

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


x17 = rnd((B, H, W, 17))
x64 = rnd((B, H // 2, W // 2, 64))
x128q = rnd((B, H // 4, W // 4, 128))
x32h = rnd((B, H // 2, W // 2, 32))
x16f = rnd((B, H, W, 16))

for tiling in (True, False):
    tag = "tiled" if tiling else "plain"
    with use_conv_tiling(tiling):
        bench(f"down0 {tag}", lambda a: _conv2_apply(U["down0"], a, stride=2),
              x17)
        bench(f"down1 {tag}", lambda a: _conv2_apply(U["down1"], a), x64)
        bench(f"up2 {tag}",
              lambda a: prelu(conv_transpose2d(a, U["up2"]["conv"]),
                              U["up2"]["alpha"]), x128q)
        bench(f"up3 {tag}",
              lambda a: prelu(conv_transpose2d(a, U["up3"]["conv"]),
                              U["up3"]["alpha"]), x64)
        bench(f"finale {tag}",
              lambda a: jax.nn.sigmoid(conv2d(a, U["conv"])), x16f)

# s2 conv sub-pieces of down1: which half is slow?
with use_conv_tiling(None):
    bench("down1 conv1 only (s2)",
          lambda a: conv_prelu(a, U["down1"]["conv1"], stride=2), x64)
    x64q = rnd((B, H // 4, W // 4, 64))
    bench("down1 conv2 only (s1)",
          lambda a: conv_prelu(a, U["down1"]["conv2"]), x64q)
    bench("down0 conv1 only (s2)",
          lambda a: conv_prelu(a, U["down0"]["conv1"], stride=2), x17)
    bench("down0 conv2 only (s1)",
          lambda a: conv_prelu(a, U["down0"]["conv2"]), x32h)

    # Cost proxy for a space-to-depth rewrite of down1 conv1: 9 one-tap
    # convs over the 4 2x2 phases (phase shifts elided — identical cost,
    # wrong values; only the lowering's speed is being asked).
    w = U["down1"]["conv1"]["conv"]["w"].astype(jnp.bfloat16)  # (3,3,64,64) HWIO

    def s2d_conv(a, w=w, p=U["down1"]["conv1"]):
        ph = [a[:, di::2, dj::2, :] for di in range(2) for dj in range(2)]
        out = None
        for ky in range(3):
            for kx in range(3):
                src = ph[(ky % 2) * 2 + (kx % 2)]
                t = lax.conv_general_dilated(
                    src, w[ky:ky + 1, kx:kx + 1],
                    window_strides=(1, 1), padding="SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    precision=lax.Precision.DEFAULT,
                    preferred_element_type=a.dtype)
                out = t if out is None else out + t
        return prelu(out + p["conv"]["b"].astype(a.dtype), p["alpha"])

    bench("down1 conv1 s2d-9tap (cost only)", s2d_conv, x64)

    # One fat matmul instead: extract 3x3x64 patches at stride 2 via
    # conv_general_dilated with an identity kernel is just the conv again;
    # instead reshape trick — 2x2 space-to-depth THEN a k2 conv over 256ch
    # (exact k3s2 == k2s1 on s2d input with regrouped taps; cost probe
    # with a random regrouped kernel).
    w2 = jax.random.normal(key, (2, 2, 256, 64), jnp.bfloat16) * 0.05

    def s2d_k2(a, w2=w2, p=U["down1"]["conv1"]):
        n, h, ww_, c = a.shape
        s2d = a.reshape(n, h // 2, 2, ww_ // 2, 2, c).transpose(
            0, 1, 3, 2, 4, 5).reshape(n, h // 2, ww_ // 2, 4 * c)
        t = lax.conv_general_dilated(
            s2d, w2, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=lax.Precision.DEFAULT,
            preferred_element_type=a.dtype)
        return prelu(t + p["conv"]["b"].astype(a.dtype), p["alpha"])

    bench("down1 conv1 s2d+k2 256ch (cost only)", s2d_k2, x64)
print("done", flush=True)
