"""Device memory monitor (TPU equivalent of rife_app's GPUMemoryMonitor,
reference rife_app/utils/memory_monitor.py:36-364).

Reads per-device HBM stats from jax device memory_stats(), keeps a
snapshot history with pressure levels (75/85/95%), exports JSON, and
offers a decorator that logs usage around a call — the observability
hooks the app layer uses to pick standard vs disk-based interpolation.
"""
from __future__ import annotations

import functools
import json
import time

import jax


def hbm_stats(device=None) -> dict:
    d = device or jax.devices()[0]
    stats = d.memory_stats() or {}
    in_use = stats.get("bytes_in_use", 0)
    limit = stats.get("bytes_limit", 0) or stats.get("bytes_reservable_limit", 0)
    return {
        "bytes_in_use": in_use,
        "bytes_limit": limit,
        "peak_bytes_in_use": stats.get("peak_bytes_in_use", 0),
        "utilization": (in_use / limit) if limit else 0.0,
    }


class MemoryMonitor:
    PRESSURE_LEVELS = (("critical", 0.95), ("high", 0.85), ("moderate", 0.75))

    def __init__(self, device=None):
        self.device = device or jax.devices()[0]
        self.history: list[dict] = []

    def snapshot(self, label: str = "") -> dict:
        s = hbm_stats(self.device)
        s.update(time=time.time(), label=label, pressure=self.pressure(s["utilization"]))
        self.history.append(s)
        return s

    @classmethod
    def pressure(cls, utilization: float) -> str:
        for name, thresh in cls.PRESSURE_LEVELS:
            if utilization >= thresh:
                return name
        return "normal"

    def recommend_disk_based(self, frames: int, h: int, w: int,
                             bytes_per_px: int = 12) -> bool:
        """Heuristic mirror of the app's hierarchical-mode recommendation
        (memory_monitor.py:182-217): spill to disk when the projected
        working set would push HBM into the high-pressure band."""
        s = hbm_stats(self.device)
        if not s["bytes_limit"]:
            return False
        projected = s["bytes_in_use"] + frames * h * w * bytes_per_px
        return projected / s["bytes_limit"] >= 0.85

    def export_json(self, path: str):
        with open(path, "w") as f:
            json.dump(self.history, f, indent=2)


def monitor_memory(label: str = ""):
    """Decorator: snapshot HBM before/after the wrapped call."""

    def deco(fn):
        @functools.wraps(fn)
        def wrapper(*a, **kw):
            mon = MemoryMonitor()
            mon.snapshot(f"{label or fn.__name__}:before")
            try:
                return fn(*a, **kw)
            finally:
                mon.snapshot(f"{label or fn.__name__}:after")

        return wrapper

    return deco
