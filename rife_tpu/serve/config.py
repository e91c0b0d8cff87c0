"""Service configuration (reference rife_app/config.py:1-20)."""
from __future__ import annotations

import os
from pathlib import Path

BASE_DIR = Path(os.environ.get("RIFE_TPU_BASE", Path.cwd()))
MODEL_DIR = Path(os.environ.get("RIFE_TPU_MODEL_DIR", BASE_DIR / "train_log"))
TEMP_DIR = BASE_DIR / "temp"
UPLOAD_DIR = TEMP_DIR / "uploads"
OUTPUT_DIR = TEMP_DIR / "outputs"
FRAMES_DIR = TEMP_DIR / "frames"

DEFAULT_FPS = 25
SERVER_NAME = os.environ.get("GRADIO_SERVER_NAME", "0.0.0.0")
SERVER_PORT = int(os.environ.get("RIFE_TPU_PORT", "7860"))
AUTH_USERNAME = os.environ.get("AUTH_USERNAME")
AUTH_PASSWORD = os.environ.get("AUTH_PASSWORD")
# Fast serving rung (qualified-approximation ladder, docs/PERFORMANCE.md
# "The qualified-approximation ladder"): 0 = bit-exact graph, 1 =
# consumer-res coarse-level warps, 2 = + half-res refine stage, 3 =
# + half-res final flow level.  The DEFAULT is the highest rung that
# passed the trained-checkpoint protocol at < 0.05 dB vs exact-f32:
# currently rung 1 (graph cost ~0 against both the 3000-step and the
# converged 16k-step checkpoints; rungs 2-4 FAILED — -3.2 dB at rung 2
# vs the converged checkpoint — and stay opt-in).
# RIFE_TPU_FAST=0 opts back into the bit-exact graph.  The active mode
# is logged at server startup (serve/app.py).


def _parse_fast(v: str) -> int:
    if v in ("", "false"):
        return 0
    if v == "true":
        return 1
    return int(v)


FAST_MODE = _parse_fast(os.environ.get("RIFE_TPU_FAST", "1"))


def ensure_dirs():
    for d in (TEMP_DIR, UPLOAD_DIR, OUTPUT_DIR, FRAMES_DIR):
        d.mkdir(parents=True, exist_ok=True)
