"""Round-3 experiment 8 (TPU): is small-C NHWC physically lane-padded,
and which resize formulation is fastest at the model's flow/mask shapes?

Hypothesis (from exp6/exp7): full-res NHWC tensors with C<=21 run ~8-40x
off their traffic floor because the (8,128) tile puts C in lanes at
C/128 density.  Probes:
  0. HBM live-bytes delta when allocating small-C NHWC tensors (direct
     physical-layout readout, no timing needed).
  1. chained x+1 copy bandwidth vs C at fixed logical bytes.
  2. moveaxis NHWC<->NCHW (plane) relayout cost at model shapes.
  3. minor-merge reshape cost ((n,h,w,2c)->(n,h,2w,c) and plane
     stack+reshape interleave).
  4. upsample x2/x4/x8 variants for the 5ch lastconv output:
     current gather-lerp vs phase-NHWC vs phase-on-planes.
"""
import os, sys, time, functools
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
import numpy as np
from jax import lax

from rife_tpu.ops import resize_bilinear

print("backend:", jax.default_backend(), flush=True)
B, H, W = 4, 736, 1280
ITERS = 50


def bench(name, fn, *args, bytes_moved=None):
    @jax.jit
    def chained(*a):
        def body(i, carry):
            out = fn(*(x + (carry * 1e-12).astype(x.dtype) for x in a))
            return jnp.sum(out.astype(jnp.float32)) * 1e-20
        return lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))
    try:
        t0 = time.perf_counter()
        float(chained(*args))
        comp = time.perf_counter() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(chained(*args))
            best = min(best, time.perf_counter() - t0)
        ms = best / ITERS * 1e3
        gbs = (bytes_moved / (best / ITERS)) / 1e9 if bytes_moved else 0
        print(f"{name}: {ms:.3f} ms  {gbs:.0f} GB/s-logical  (compile {comp:.0f}s)",
              flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)


key = jax.random.PRNGKey(0)


def up_phase_nhwc(x, f):
    """Integer-factor bilinear upsample, phase-decomposed, NHWC.
    Per axis: each of the f output phases is a fixed 2-tap lerp of the
    input; phases are interleaved by a minor-merge reshape."""
    for axis in (1, 2):
        size = x.shape[axis]
        srcs = (np.arange(f) + 0.5) / f - 0.5
        i0 = np.floor(srcs).astype(int)        # -1 or 0
        lam = (srcs - i0).astype(np.float32)
        lo = jnp.concatenate([x.take(jnp.asarray([0]), axis),
                              lax.slice_in_dim(x, 0, size - 1, axis=axis)], axis)
        hi = jnp.concatenate([lax.slice_in_dim(x, 1, size, axis=axis),
                              x.take(jnp.asarray([size - 1]), axis)], axis)
        phases = []
        for p in range(f):
            a, bb = (lo, x) if i0[p] < 0 else (x, hi)
            wl = jnp.asarray(1 - lam[p], x.dtype)
            phases.append(a * wl + bb * (1 - wl))
        st = jnp.stack(phases, axis + 1)       # (n, size, f, ...)
        x = st.reshape(x.shape[:axis] + (size * f,) + x.shape[axis + 1:])
    return x


def up_phase_planes(x, f):
    """Same, but on (N,C,H,W) planes (moveaxis in/out included)."""
    p = jnp.moveaxis(x, -1, 1)
    for axis in (2, 3):
        size = p.shape[axis]
        srcs = (np.arange(f) + 0.5) / f - 0.5
        i0 = np.floor(srcs).astype(int)
        lam = (srcs - i0).astype(np.float32)
        lo = jnp.concatenate([p.take(jnp.asarray([0]), axis),
                              lax.slice_in_dim(p, 0, size - 1, axis=axis)], axis)
        hi = jnp.concatenate([lax.slice_in_dim(p, 1, size, axis=axis),
                              p.take(jnp.asarray([size - 1]), axis)], axis)
        phases = []
        for q in range(f):
            a, bb = (lo, p) if i0[q] < 0 else (p, hi)
            wl = jnp.asarray(1 - lam[q], p.dtype)
            phases.append(a * wl + bb * (1 - wl))
        st = jnp.stack(phases, axis + 1)
        p = st.reshape(p.shape[:axis] + (size * f,) + p.shape[axis + 1:])
    return jnp.moveaxis(p, 1, -1)


def down4_phase(x):
    # src = 4*dst + 1.5 -> mean of taps 4d+1, 4d+2 (both axes)
    for axis in (1, 2):
        size = x.shape[axis]
        a = lax.slice_in_dim(x, 1, size, axis=axis, stride=4)
        b = lax.slice_in_dim(x, 2, size, axis=axis, stride=4)
        x = (a + b) * jnp.asarray(0.5, x.dtype)
    return x


if jax.default_backend() != "tpu":
    # CPU: validate the phase-resize math against the golden path, exit.
    ok = True
    for f, (h, w) in ((2, (16, 32)), (4, (8, 16)), (8, (4, 8))):
        xs = jax.random.uniform(key, (1, h, w, 5), jnp.float32)
        ref = resize_bilinear(xs, (h * f, w * f))
        for nm, fn in (("nhwc", up_phase_nhwc), ("plane", up_phase_planes)):
            err = float(jnp.max(jnp.abs(fn(xs, f) - ref)))
            print(f"  up x{f} {nm}: max err {err:.2e}", flush=True)
            ok &= err < 1e-6
    xs = jax.random.uniform(key, (1, 32, 64, 6), jnp.float32)
    err = float(jnp.max(jnp.abs(down4_phase(xs) - resize_bilinear(xs, (8, 16)))))
    print(f"  down x4 strided: max err {err:.2e}", flush=True)
    ok &= err < 1e-6
    print("CPU check", "PASS" if ok else "FAIL", flush=True)
    sys.exit(0 if ok else 1)

# ---- probe 0: physical allocation size ---------------------------------
def live_bytes():
    try:
        stats = jax.local_devices()[0].memory_stats()
        return stats.get("bytes_in_use", 0)
    except Exception:
        return 0


print("--- probe 0: HBM bytes per NHWC alloc (logical MB -> physical MB)")
for c in (3, 5, 17, 21, 32, 128):
    b0 = live_bytes()
    x = jax.block_until_ready(jnp.ones((B, H, W, c), jnp.bfloat16))
    b1 = live_bytes()
    logical = B * H * W * c * 2 / 1e6
    print(f"  C={c:3d}: logical {logical:7.1f} MB  physical {(b1-b0)/1e6:8.1f} MB",
          flush=True)
    del x

# ---- probe 1: copy bandwidth vs C --------------------------------------
for c in (3, 5, 17, 32, 128):
    x = jax.random.uniform(key, (B, H, W, c), jnp.bfloat16)
    nb = 2 * x.size * 2  # read + write, logical
    bench(f"copy NHWC C={c}", lambda t: t + 1.0, x, bytes_moved=nb)

# ---- probe 2: relayout costs -------------------------------------------
for c in (3, 5, 17):
    x = jax.random.uniform(key, (B, H, W, c), jnp.bfloat16)
    bench(f"moveaxis NHWC->NCHW C={c}",
          lambda t: jnp.moveaxis(t, -1, 1), x, bytes_moved=2 * x.size * 2)
    xp = jnp.moveaxis(x, -1, 1)
    bench(f"moveaxis NCHW->NHWC C={c}",
          lambda t: jnp.moveaxis(t, 1, -1), xp, bytes_moved=2 * x.size * 2)

# ---- probe 3: minor-merge reshape --------------------------------------
x2 = jax.random.uniform(key, (B, H, W // 2, 10), jnp.bfloat16)
bench("reshape (n,h,w/2,2*5)->(n,h,w,5)",
      lambda t: t.reshape(B, H, W, 5), x2, bytes_moved=2 * x2.size * 2)
p2 = jax.random.uniform(key, (B, 5, H, W // 2), jnp.bfloat16)
bench("plane stack+reshape (n,5,h,w/2)x2->(n,5,h,w)",
      lambda t: jnp.stack([t, t + 1], -1).reshape(B, 5, H, W),
      p2, bytes_moved=3 * p2.size * 2)

# ---- probe 4: upsample variants ----------------------------------------
for f, (h, w) in ((2, (368, 640)), (4, (184, 320)), (8, (92, 160))):
    xs = jax.random.uniform(key, (B, h, w, 5), jnp.bfloat16)
    nb = (xs.size + xs.size * f * f) * 2
    bench(f"up x{f} 5ch current", lambda t, f=f: resize_bilinear(
        t, (t.shape[1] * f, t.shape[2] * f)), xs, bytes_moved=nb)
    bench(f"up x{f} 5ch phase-nhwc", functools.partial(up_phase_nhwc, f=f),
          xs, bytes_moved=nb)
    bench(f"up x{f} 5ch phase-plane", functools.partial(up_phase_planes, f=f),
          xs, bytes_moved=nb)

# down x4 6ch (block0 input) and down x2 17ch phase forms
x6 = jax.random.uniform(key, (B, H, W, 6), jnp.bfloat16)
bench("down x4 6ch current", lambda t: resize_bilinear(t, (H // 4, W // 4)),
      x6, bytes_moved=(x6.size + x6.size // 16) * 2)
bench("down x4 6ch phase-strided", down4_phase,
      x6, bytes_moved=(x6.size + x6.size // 16) * 2)

print("done", flush=True)
