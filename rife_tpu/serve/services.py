"""Service-layer operations over the TPU engine.

Framework-agnostic equivalents of rife_app/services/ (SURVEY.md §2.6):

- interpolate_pair_to_video: image pair -> interpolated clip with the
  app's padding contract (centered, min 512, %32 — framing.py:216-253),
  passes-of-2x doubling or disk-based mode
  (services/image_interpolator.py:13-126).
- interpolate_video_file: streaming multi-pass video interpolation
  (services/video_interpolator.py:25-205) over the threaded pipeline.
- chained_transitions: 3-video chaining with interpolated transition
  segments between boundary frames (services/chained.py:19-339).
- reencode_video: standards-checking re-encode
  (services/simple_reencoder.py:18-436) — ffmpeg one-pass when
  available, cv2 rebuild otherwise.

Encoding uses ffmpeg (libx264 CRF18 BT.709 — the reference's quality
contract, image_interpolator.py:90-106) when the binary exists and
falls back to cv2's mp4 writer otherwise.
"""
from __future__ import annotations

import os
import subprocess
import tempfile

import numpy as np

import jax.numpy as jnp

from rife_tpu.engine import InferenceEngine, exp_doubling
from rife_tpu.engine.disk_interp import DiskInterpolator
from rife_tpu.ops import pad_centered
from rife_tpu.video import (
    VideoJob,
    VideoReader,
    VideoWriter,
    have_ffmpeg,
    interpolate_video,
    transfer_audio,
)
from rife_tpu.video.framing import extract_boundary_frame, get_video_info

FFMPEG_QUALITY = [
    "-c:v", "libx264", "-preset", "slow", "-crf", "18",
    "-pix_fmt", "yuv420p",
    "-color_primaries", "bt709", "-color_trc", "bt709", "-colorspace", "bt709",
]


def _encode_frames(frames01: list[np.ndarray], out_path: str, fps: float):
    """PNG dump + ffmpeg libx264/CRF18/BT.709, cv2 fallback."""
    import cv2

    h, w = frames01[0].shape[:2]
    if have_ffmpeg():
        with tempfile.TemporaryDirectory() as td:
            for i, f in enumerate(frames01):
                u8 = (np.clip(f, 0, 1) * 255 + 0.5).astype(np.uint8)
                cv2.imwrite(os.path.join(td, f"{i:07d}.png"), u8[..., ::-1])
            cmd = ["ffmpeg", "-y", "-hide_banner", "-loglevel", "error",
                   "-framerate", str(fps), "-i", os.path.join(td, "%07d.png"),
                   *FFMPEG_QUALITY, out_path]
            subprocess.run(cmd, check=True)
        return
    writer = cv2.VideoWriter(out_path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    for f in frames01:
        u8 = (np.clip(f, 0, 1) * 255 + 0.5).astype(np.uint8)
        writer.write(u8[..., ::-1])
    writer.release()


def interpolate_pair_to_video(engine: InferenceEngine, img0: np.ndarray,
                              img1: np.ndarray, out_path: str, *,
                              passes: int = 4, fps: float = 25.0,
                              disk_based: bool = False,
                              workdir: str | None = None) -> dict:
    """img0/img1: HWC float RGB [0,1].  2^passes - 1 intermediates."""
    a, pad = pad_centered(jnp.asarray(img0[None]), 32, 512)
    b, _ = pad_centered(jnp.asarray(img1[None]), 32, 512)
    if disk_based:
        di = DiskInterpolator(engine, workdir or tempfile.mkdtemp(prefix="rife_disk_"))
        padded = di.interpolate(
            [np.asarray(a[0], np.float32), np.asarray(b[0], np.float32)],
            (1 << passes) + 1,
        )
        frames = [np.asarray(pad.crop(jnp.asarray(f[None]))[0]) for f in padded]
        di.cleanup()
    else:
        dev_frames = exp_doubling(engine, [a, b], passes)
        frames = [np.asarray(pad.crop(f)[0], dtype=np.float32) for f in dev_frames]
    _encode_frames(frames, out_path, fps)
    return {"frames": len(frames), "output": out_path, "disk_based": disk_based}


def interpolate_video_file(engine: InferenceEngine, in_path: str, out_path: str, *,
                           exp: int = 1, keep_audio: bool = True) -> dict:
    reader = VideoReader(in_path)
    writer = VideoWriter(out_path, reader.fps * (1 << exp), reader.width, reader.height)
    job = VideoJob(exp=exp, use_timestep=engine.supports_timestep)
    stats = interpolate_video(engine, reader, writer, job)
    writer.close()
    if keep_audio:
        stats["audio"] = transfer_audio(in_path, out_path)
    return stats


def chained_transitions(engine: InferenceEngine, videos: list[str], out_path: str, *,
                        transition_passes: int = 4, fps: float | None = None) -> dict:
    """Concatenate videos with interpolated transitions between boundary
    frames (services/chained.py).  Output fps follows the first video."""
    import cv2

    assert len(videos) >= 2
    info = get_video_info(videos[0])
    fps = fps or info["fps"]

    all_frames: list[np.ndarray] = []
    for vi, path in enumerate(videos):
        reader = VideoReader(path)
        for frame in reader:
            all_frames.append(frame)
        if vi < len(videos) - 1:
            last = extract_boundary_frame(path, "last")
            first = extract_boundary_frame(videos[vi + 1], "first")
            a, pad = pad_centered(jnp.asarray(last[None]), 32, 512)
            b, _ = pad_centered(jnp.asarray(first[None]), 32, 512)
            mids = exp_doubling(engine, [a, b], transition_passes)[1:-1]
            all_frames.extend(np.asarray(pad.crop(m)[0], np.float32) for m in mids)
    _encode_frames(all_frames, out_path, fps)
    return {"videos": len(videos), "frames": len(all_frames), "output": out_path}


def reencode_video(in_path: str, out_path: str) -> dict:
    """Standards-checking re-encode (services/simple_reencoder.py)."""
    from rife_tpu.serve.analyzer import analyze_video, is_compliant

    analysis = analyze_video(in_path)
    if is_compliant(analysis):
        import shutil

        shutil.copyfile(in_path, out_path)
        return {"action": "copied", "analysis": analysis}
    if have_ffmpeg():
        cmd = ["ffmpeg", "-y", "-hide_banner", "-loglevel", "error", "-i", in_path,
               *FFMPEG_QUALITY, "-c:a", "aac", "-b:a", "192k", "-ar", "16000", out_path]
        subprocess.run(cmd, check=True)
        return {"action": "reencoded_ffmpeg", "analysis": analysis}
    reader = VideoReader(in_path)
    frames = list(reader)
    _encode_frames(frames, out_path, reader.fps)
    return {"action": "reencoded_cv2", "analysis": analysis}
