"""Video decode/encode + audio remux.

Reference behaviors covered: mp4/frame-dir input (inference_video.py:113-140),
cv2 writer / png output (inference_video.py:141-152), and the ffmpeg audio
remux fallback chain lossless-copy -> AAC transcode -> silent
(inference_video.py:16-54).  ffmpeg is an optional external binary exactly
as in the reference (its only native dependency); when absent we degrade
to cv2-only output with a warning instead of failing.
"""
from __future__ import annotations

import os
import shutil
import subprocess

import cv2
import numpy as np


def have_ffmpeg() -> bool:
    return shutil.which("ffmpeg") is not None


class VideoReader:
    """cv2-based sequential frame reader yielding RGB HWC frames.

    dtype="uint8" (pipeline fast path: normalization happens on device)
    or "float32" in [0,1] (service-layer compatibility).
    """

    def __init__(self, path: str, dtype: str = "float32"):
        self.cap = cv2.VideoCapture(path)
        if not self.cap.isOpened():
            raise FileNotFoundError(path)
        self.fps = self.cap.get(cv2.CAP_PROP_FPS) or 25.0
        self.frame_count = int(self.cap.get(cv2.CAP_PROP_FRAME_COUNT))
        self.width = int(self.cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        self.height = int(self.cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        self.dtype = dtype

    def __iter__(self):
        while True:
            ok, frame = self.cap.read()
            if not ok:
                break
            rgb = np.ascontiguousarray(frame[..., ::-1])
            if self.dtype == "uint8":
                yield rgb
            else:
                from rife_tpu.native import u8_to_f32

                yield u8_to_f32(rgb)
        self.cap.release()


class PngDirReader:
    """Numbered-png directory input (inference_video.py:133-140)."""

    def __init__(self, path: str, fps: float = 25.0):
        self.files = sorted(
            (f for f in os.listdir(path) if f.lower().endswith(".png")),
            key=lambda f: int("".join(ch for ch in os.path.splitext(f)[0] if ch.isdigit()) or 0),
        )
        if not self.files:
            raise FileNotFoundError(f"no .png frames in {path}")
        self.path = path
        self.fps = fps
        self.frame_count = len(self.files)
        probe = cv2.imread(os.path.join(path, self.files[0]))
        self.height, self.width = probe.shape[:2]

    def __iter__(self):
        from rife_tpu.native import u8_to_f32

        for f in self.files:
            img = cv2.imread(os.path.join(self.path, f))
            yield u8_to_f32(img[..., ::-1])


class VideoWriter:
    def __init__(self, path: str, fps: float, width: int, height: int, codec: str = "mp4v"):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self.writer = cv2.VideoWriter(
            path, cv2.VideoWriter_fourcc(*codec), fps, (width, height)
        )
        self.path = path

    def write(self, frame_u8_rgb: np.ndarray):
        self.writer.write(frame_u8_rgb[..., ::-1])

    def close(self):
        self.writer.release()


class PngDirWriter:
    def __init__(self, path: str, **_):
        os.makedirs(path, exist_ok=True)
        self.path = path
        self.idx = 0

    def write(self, frame_u8_rgb: np.ndarray):
        cv2.imwrite(os.path.join(self.path, f"{self.idx:0>7d}.png"), frame_u8_rgb[..., ::-1])
        self.idx += 1

    def close(self):
        pass


def _run_quiet(cmd: list[str]) -> bool:
    try:
        r = subprocess.run(cmd, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        return r.returncode == 0
    except OSError:
        return False


def transfer_audio(source_video: str, target_video: str) -> str:
    """Remux audio from source into target (inference_video.py:16-54):
    try lossless stream copy, then AAC transcode, else leave silent.
    Returns a status string for logging."""
    if not have_ffmpeg():
        return "no-ffmpeg: output keeps no audio"
    base = target_video + ".noaudio.mp4"
    os.replace(target_video, base)
    ok = _run_quiet([
        "ffmpeg", "-y", "-hide_banner", "-loglevel", "error",
        "-i", base, "-i", source_video,
        "-c", "copy", "-map", "0:v:0", "-map", "1:a:0", target_video,
    ]) and os.path.getsize(target_video) > 0
    if ok:
        os.remove(base)
        return "audio copied losslessly"
    ok = _run_quiet([
        "ffmpeg", "-y", "-hide_banner", "-loglevel", "error",
        "-i", base, "-i", source_video,
        "-c:v", "copy", "-c:a", "aac", "-b:a", "160k",
        "-map", "0:v:0", "-map", "1:a:0", target_video,
    ]) and os.path.exists(target_video) and os.path.getsize(target_video) > 0
    if ok:
        os.remove(base)
        return "audio transcoded to AAC"
    os.replace(base, target_video)
    return "audio transfer failed: output keeps no audio"
