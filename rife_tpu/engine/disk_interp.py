"""O(1)-memory disk-spill interpolation.

Reference: rife_app/utils/disk_based_interpolation.py:44-465 — frames
persist as PNGs and only one pair is device-resident at a time; midpoint
"waves" run until the target count is reached (safety cap 10), then a
uniform trim fixes overshoot.  On TPU the HBM streaming engine makes
this mostly unnecessary, but it remains the right strategy for very deep
slow-motion on small-memory hosts, so it is kept as an engine scheduling
strategy with the same wave/trim behavior.
"""
from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

import jax.numpy as jnp

MAX_WAVES = 10


@dataclass
class FrameRef:
    path: str
    index: float  # temporal position key (floats between sources)
    wave: int


class DiskInterpolator:
    def __init__(self, engine, workdir: str):
        self.engine = engine
        self.workdir = workdir
        os.makedirs(workdir, exist_ok=True)
        self._counter = 0

    def _save(self, arr01: np.ndarray, index: float, wave: int) -> FrameRef:
        import cv2

        path = os.path.join(self.workdir, f"f{self._counter:07d}.png")
        self._counter += 1
        from rife_tpu.native import f32_to_u8

        cv2.imwrite(path, f32_to_u8(arr01)[..., ::-1])
        return FrameRef(path, index, wave)

    def _load(self, ref: FrameRef) -> np.ndarray:
        import cv2

        from rife_tpu.native import u8_to_f32

        return u8_to_f32(cv2.imread(ref.path)[..., ::-1])

    def interpolate(self, frames01: list[np.ndarray], target_count: int) -> list[np.ndarray]:
        """Densify `frames01` to >= target_count frames via midpoint waves,
        then uniformly trim to exactly target_count."""
        refs = [self._save(f, float(i), 0) for i, f in enumerate(frames01)]
        wave = 0
        while len(refs) < target_count and wave < MAX_WAVES:
            wave += 1
            new_refs: list[FrameRef] = []
            for a, b in zip(refs[:-1], refs[1:]):
                new_refs.append(a)
                fa = jnp.asarray(self._load(a)[None])
                fb = jnp.asarray(self._load(b)[None])
                mid = np.asarray(self.engine.interpolate(fa, fb), dtype=np.float32)[0]
                new_refs.append(self._save(mid, (a.index + b.index) / 2, wave))
            new_refs.append(refs[-1])
            refs = new_refs
        if len(refs) > target_count:
            keep = np.linspace(0, len(refs) - 1, target_count).round().astype(int)
            refs = [refs[i] for i in keep]
        return [self._load(r) for r in refs]

    def cleanup(self):
        for f in os.listdir(self.workdir):
            if f.endswith(".png"):
                os.remove(os.path.join(self.workdir, f))
