"""Jitted pair-interpolation engine with shape-bucket compile cache.

Equivalent of the reference Model.inference (model/RIFE.py:56-65,
train_log/RIFE_HDv3.py:56-60), redesigned for XLA:

- the whole forward (pyramid + warps + refine [+ TTA ensemble]) is ONE
  jitted graph; video resolutions are bucketed by padded shape and each
  bucket compiles once (SURVEY.md §7 hard part #3).
- timestep is a traced scalar argument, so arbitrary-timestep models
  (rife_m, v4.25) serve any t without recompiling.
- compute dtype is a constructor knob: bf16 activations with f32
  accumulation for throughput (TPU-native replacement for the
  reference's fp16 mode, inference_video.py:85-86), f32 for parity work.
  Flow/merge math stays in the compute dtype; coordinates inside warp
  are always f32.
- TTA is the reference's double-flip ensemble (RIFE.py:62-65) traced
  into the same graph.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from rife_tpu.models.registry import MODEL_REGISTRY, ModelDef


class InferenceEngine:
    def __init__(self, model: str = "rife", params=None, *,
                 compute_dtype=jnp.float32, scale: float = 1.0, seed: int = 0,
                 warp_impl: str | None = None, fast: bool | int = False):
        self.model_def: ModelDef = MODEL_REGISTRY[model]
        self.model_name = model
        # `fast` is the approximation-ladder rung.  Only rungs that pass
        # the trained-weights protocol (< 0.05 dB vs exact-f32) may be
        # the serving default — currently rung 1; rungs 2-4 FAILED
        # qualification against the converged r5 checkpoint and are
        # explicit opt-ins (docs/PERFORMANCE.md "The qualified-
        # approximation ladder"):
        #   0/False  bit-exact graph
        #   1/True   consumer-resolution coarse-level warps (fast_level0)
        #   2        + half-resolution refine stage (fast_refine;
        #            paper-model family only — v4.25 has no refine)
        #   3        + final flow level at half resolution (the
        #            reference's own scale knob, scale_list (4,2,1) ->
        #            (4,2,2) — inference_video.py --UHD semantics
        #            applied to the last level only)
        #   4        + refine stage off entirely (blend only, no
        #            contextnet/U-Net residual — what the reference's
        #            own v4.25 fastmode ships, train_log/
        #            IFNet_HDv3.py:160-168, applied to the paper family)
        rung = int(fast)
        if rung >= 1 and hasattr(self.model_def.config, "fast_level0"):
            import dataclasses

            repl = {"fast_level0": True}
            if rung >= 2 and hasattr(self.model_def.config, "fast_refine"):
                repl["fast_refine"] = True
            if rung >= 4 and hasattr(self.model_def.config, "refine"):
                repl["refine"] = False
            self.model_def = dataclasses.replace(
                self.model_def,
                config=dataclasses.replace(self.model_def.config, **repl))
            if rung >= 3 and tuple(self.model_def.scale_list) == (4.0, 2.0, 1.0):
                self.model_def = dataclasses.replace(
                    self.model_def, scale_list=(4.0, 2.0, 2.0))
        if params is None:
            params = self.model_def.init(jax.random.PRNGKey(seed), self.model_def.config)
        self.params = params
        self.compute_dtype = jnp.dtype(compute_dtype)
        self.scale = scale
        self.scale_list = tuple(s / scale for s in self.model_def.scale_list)
        # TPU serving uses the Pallas warp kernel; CPU/tests the exact
        # XLA gather (see rife_tpu.ops.pallas.warp docstring).
        if warp_impl is None:
            warp_impl = "pallas" if jax.default_backend() == "tpu" else "xla"
        self.warp_impl = warp_impl
        self._cache: dict = {}

    # -- graph construction -------------------------------------------------

    def _forward(self, params, img0, img1, timestep, tta: bool,
                 with_flow: bool = False):
        img0 = img0.astype(self.compute_dtype)
        img1 = img1.astype(self.compute_dtype)
        apply = self.model_def.apply
        cfg = self.model_def.config

        def run(a, b):
            out = apply(params, a, b, timestep=timestep,
                        scale_list=self.scale_list, cfg=cfg)
            return out["merged"][-1], out["flow_list"][-1]

        mid, flow = run(img0, img1)
        if tta:
            flip = lambda x: x[:, ::-1, ::-1, :]
            mid2, _ = run(flip(img0), flip(img1))
            mid = (mid + flip(mid2)) / 2
        if with_flow:
            # finest-level flow (used by the spatial-shard motion guard)
            return mid, flow
        return mid

    def _trace_key(self):
        """Every knob the traced graph closes over (warp_impl and the
        blend-fusion A/B switch are read from contextvars at trace time;
        scale_list/compute_dtype via self).  Mutating any of these after
        a first call must retrace, not silently serve the stale graph
        (round-3 VERDICT weak #4; round-4 ADVICE #1 for _FUSE_BLEND)."""
        from rife_tpu.ops.warp import _FUSE_BLEND

        return (self.warp_impl, tuple(self.scale_list),
                str(self.compute_dtype), _FUSE_BLEND.get())

    def _get_fn(self, shape, tta: bool):
        key = (shape, tta, self._trace_key())
        fn = self._cache.get(key)
        if fn is None:
            fn = jax.jit(functools.partial(self._forward, tta=tta))
            self._cache[key] = fn
        return fn

    # -- public API ---------------------------------------------------------

    def interpolate(self, img0: jnp.ndarray, img1: jnp.ndarray,
                    timestep: float = 0.5, tta: bool = False) -> jnp.ndarray:
        """Midpoint/arbitrary-t frame for a padded NHWC pair in [0,1]."""
        from rife_tpu.ops import use_warp_impl

        fn = self._get_fn(img0.shape, tta)
        t = jnp.asarray(timestep, jnp.float32)
        with use_warp_impl(self.warp_impl):  # read at trace time
            return fn(self.params, img0, img1, t)

    def interpolate_batch(self, pairs0, pairs1, timestep=0.5, tta=False):
        """Batched pair interpolation — stack frame pairs along N to fill
        the chip (the video pipeline's throughput path)."""
        return self.interpolate(pairs0, pairs1, timestep, tta)

    @property
    def pad_multiple(self) -> int:
        """Spatial padding granularity: max(m, m/scale) like the
        reference pad contract (inference_video.py:199)."""
        m = self.model_def.pad_multiple
        return int(max(m, m / self.scale))

    @property
    def supports_timestep(self) -> bool:
        return self.model_name in ("rife_m", "v4.25")

    def warmup(self, shape, tta: bool = False):
        """Compile the bucket for `shape` ahead of time."""
        z = jnp.zeros(shape, self.compute_dtype)
        self.interpolate(z, z, 0.5, tta).block_until_ready()
