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
# opt-in fast serving mode (half-res level-0 warps, not exact — see
# docs/PERFORMANCE.md "Fast serving mode")
# fast serving graph is the qualified default (< 0.05 dB vs exact with
# trained weights through the Vimeo protocol, docs/PERFORMANCE.md
# "Fast-mode qualification"); RIFE_TPU_FAST=0 opts out.
FAST_MODE = os.environ.get("RIFE_TPU_FAST", "1") not in ("0", "", "false")


def ensure_dirs():
    for d in (TEMP_DIR, UPLOAD_DIR, OUTPUT_DIR, FRAMES_DIR):
        d.mkdir(parents=True, exist_ok=True)
