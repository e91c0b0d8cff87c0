"""Streaming video interpolation pipeline — the perf-critical driver.

Reference: inference_video.py:154-297.  Host architecture: a decode
thread fills a bounded queue, the main thread runs the jitted TPU graph,
an encode thread drains a second queue — decode/infer/encode overlap
exactly like the reference's reader/writer threads, with the TPU's async
dispatch giving double-buffering on-device for free (the next pair is
enqueued while the previous executes).

Behavioral contract preserved (SURVEY.md §7):
- per-pair ssim_matlab on 32x32 bilinear probes (inference_video.py:226-228)
- ssim > 0.996  => static frame: read one frame ahead and synthesize a
  replacement midpoint (inference_video.py:231-243)
- ssim < 0.2    => scene cut: emit 2^exp - 1 copies of I0
  (inference_video.py:245-249)
- padding to multiple of max(32, 32/scale) (inference_video.py:199-202)
- montage side-by-side original|output (inference_video.py:196-205,261-265)
- --fps override drops audio; default name {base}_{2^exp}X_{fps}fps.ext
  (inference_video.py:128-131,151)
"""
from __future__ import annotations

import queue
import threading
import time
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from rife_tpu.engine.schedule import midpoint_tree, timestep_frames
from rife_tpu.ops import pad_to_multiple, ssim_matlab
from rife_tpu.ops.pad import plan_pad_to_multiple

STATIC_SSIM = 0.996
SCENE_SSIM = 0.2


@dataclass
class VideoJob:
    exp: int = 1
    scale: float = 1.0
    montage: bool = False
    tta: bool = False
    use_timestep: bool = False  # direct-t schedule for rife_m/v4.25
    queue_size: int = 500
    stats: dict = field(default_factory=dict)


def _probe_fn():
    """Jitted 32x32 ssim_matlab probe used by both gates."""

    @jax.jit
    def probe(a, b):
        return ssim_matlab(a, b, val_range=1.0)

    return probe


def _to_u8(x) -> np.ndarray:
    return np.asarray(jnp.clip(x * 255.0 + 0.5, 0, 255).astype(jnp.uint8))


def _small(x):
    """32x32 probe via mean-pooling-free bilinear (device-side)."""
    from rife_tpu.ops import resize_bilinear

    return resize_bilinear(x, (32, 32))


def interpolate_video(engine, reader, writer, job: VideoJob, *,
                      progress=None) -> dict:
    """Stream frames from reader through the engine into writer.

    Returns stats: frames in/out, static/scene-cut counts, fps achieved.
    """
    n_out_per_gap = (1 << job.exp) - 1
    probe = _probe_fn()

    read_q: queue.Queue = queue.Queue(maxsize=job.queue_size)
    write_q: queue.Queue = queue.Queue(maxsize=job.queue_size)

    def read_loop():
        for frame in reader:
            read_q.put(frame)
        read_q.put(None)

    write_err = []

    def write_loop():
        try:
            while True:
                item = write_q.get()
                if item is None:
                    break
                writer.write(item)
        except Exception as e:  # surface encoder failures to the main thread
            write_err.append(e)

    rt = threading.Thread(target=read_loop, daemon=True)
    wt = threading.Thread(target=write_loop, daemon=True)
    rt.start()
    wt.start()

    mult = getattr(engine, "pad_multiple", int(max(32, 32 / job.scale)))
    pad = None
    stats = {"frames_in": 0, "frames_out": 0, "static": 0, "scene_cut": 0}
    t0 = time.perf_counter()

    def emit(frame_dev, orig=None):
        u8 = _to_u8(pad.crop(frame_dev)[0])
        if job.montage and orig is not None:
            left = _to_u8(pad.crop(orig)[0])
            u8 = np.concatenate([left, u8], axis=1)
        write_q.put(u8)
        stats["frames_out"] += 1

    prep_cache = {}

    def device_frame(np_frame):
        # uint8 frames ship 4x fewer bytes over the host->device link;
        # normalize + pad runs fused on device.
        if np_frame.dtype == np.uint8:
            key = np_frame.shape
            fn = prep_cache.get(key)
            if fn is None:
                from rife_tpu.ops.pad import plan_pad_to_multiple

                p0 = plan_pad_to_multiple(np_frame.shape[0], np_frame.shape[1], mult)

                @jax.jit
                def _prep(u8):
                    x = u8.astype(engine.compute_dtype) / 255.0
                    return jnp.pad(x[None], ((0, 0), (p0.top, p0.bottom),
                                             (p0.left, p0.right), (0, 0)))

                fn = (_prep, p0)
                prep_cache[key] = fn
            _prep, p0 = fn
            return _prep(jnp.asarray(np_frame)), p0
        x, p = pad_to_multiple(jnp.asarray(np_frame[None]), mult)
        return x, p

    def interpolate_gap(a, b):
        if job.use_timestep and engine.supports_timestep:
            return timestep_frames(engine, a, b, n_out_per_gap, job.tta)
        return midpoint_tree(engine, a, b, n_out_per_gap, job.tta)

    last = read_q.get()
    if last is None:
        write_q.put(None)
        wt.join()
        return stats
    I1, pad = device_frame(last)
    stats["frames_in"] += 1
    emitted_any = False

    while True:
        nxt = read_q.get()
        if nxt is None:
            break
        stats["frames_in"] += 1
        I0 = I1
        I1, _ = device_frame(nxt)
        if not emitted_any:
            emit(I0, I0)
            emitted_any = True

        s = float(probe(_small(I0), _small(I1)))
        if s > STATIC_SSIM:
            # Static pair: look one frame ahead and synthesize a
            # replacement for I1 halfway to the *next* frame.
            stats["static"] += 1
            after = read_q.get()
            if after is not None:
                stats["frames_in"] += 1
                I2, _ = device_frame(after)
                I1_syn = engine.interpolate(I1, I2, 0.5, job.tta)
                mids = interpolate_gap(I0, I1_syn)
                for m in mids:
                    emit(m, I0)
                emit(I1, I1)
                I1 = I2
                continue
            # no frame after: fall through to plain interpolation
            mids = interpolate_gap(I0, I1)
        elif s < SCENE_SSIM:
            stats["scene_cut"] += 1
            mids = [I0] * n_out_per_gap
        else:
            mids = interpolate_gap(I0, I1)
        for m in mids:
            emit(m, I0)
        emit(I1, I1)

    if not emitted_any:
        emit(I1, I1)
    write_q.put(None)
    wt.join()
    if write_err:
        raise write_err[0]
    dt = time.perf_counter() - t0
    stats["seconds"] = round(dt, 3)
    stats["fps_out"] = round(stats["frames_out"] / dt, 2) if dt > 0 else 0.0
    if progress:
        progress(stats)
    return stats
