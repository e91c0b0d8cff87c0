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
from rife_tpu.ops import pad_to_multiple
from rife_tpu.ops.pad import plan_pad_to_multiple
from rife_tpu.video.probe import probe_small, ssim_probe

STATIC_SSIM = 0.996
SCENE_SSIM = 0.2


@dataclass
class VideoJob:
    exp: int = 1
    scale: float = 1.0
    montage: bool = False
    tta: bool = False
    use_timestep: bool = False  # direct-t schedule for rife_m/v4.25
    queue_size: int = 64  # device frames pin HBM while queued
    batch: int = 4  # gap batching for the 2X fast path (exp==1)
    stats: dict = field(default_factory=dict)


_SMALL = None


def _small_fn():
    """Jitted 32x32 f32 downsample of a device frame, fetched for the
    host-side scene gate.  Process-wide singleton (a fresh jit wrapper
    per interpolate_video call re-traced on every short service request;
    compiles are ~minutes on tunneled stacks).

    Only the static-replacement branch uses this — the synthesized
    candidate frame exists only on device, and static hits are rare.
    The steady-state per-pair gate runs entirely host-side
    (video/probe.py) so the main loop never blocks on a device fetch
    (reference probes on device per pair, inference_video.py:226-228;
    at the fps target one sync per pair is material)."""
    global _SMALL
    if _SMALL is None:
        from rife_tpu.ops import resize_bilinear

        @jax.jit
        def small(a):
            return resize_bilinear(a.astype(jnp.float32), (32, 32))[0]

        _SMALL = small
    return _SMALL


# Module-level prep/post graph caches: fresh closures per interpolate_video
# call meant a re-trace (= a multi-minute compile on tunneled stacks) per
# short service request.  Keyed by everything the trace closes over.
_PREP_CACHE: dict = {}
_POST_CACHE: dict = {}


def _prep_graph(shape, mult, compute_dtype):
    key = (shape, mult, jnp.dtype(compute_dtype).name)
    hit = _PREP_CACHE.get(key)
    if hit is None:
        p0 = plan_pad_to_multiple(shape[0], shape[1], mult)

        @jax.jit
        def _prep(u8):
            x = u8.astype(compute_dtype) / 255.0
            return jnp.pad(x[None], ((0, 0), (p0.top, p0.bottom),
                                     (p0.left, p0.right), (0, 0)))

        hit = (_prep, p0)
        _PREP_CACHE[key] = hit
    return hit


def _post_graph(shape, pad):
    key = (shape, pad)
    fn = _POST_CACHE.get(key)
    if fn is None:
        @jax.jit
        def _post(x):
            y = pad.crop(x.astype(jnp.float32))
            return jnp.clip(y * 255.0 + 0.5, 0, 255).astype(jnp.uint8)

        _POST_CACHE[key] = fn = _post
    return fn


def interpolate_video(engine, reader, writer, job: VideoJob, *,
                      progress=None) -> dict:
    """Stream frames from reader through the engine into writer.

    Returns stats: frames in/out, static/scene-cut counts, fps achieved.
    """
    n_out_per_gap = (1 << job.exp) - 1

    read_q: queue.Queue = queue.Queue(maxsize=job.queue_size)
    write_q: queue.Queue = queue.Queue(maxsize=job.queue_size)

    def read_loop():
        for frame in reader:
            read_q.put(frame)
        read_q.put(None)

    write_err = []

    def write_loop():
        # The writer thread owns ALL device->host fetches so downloads
        # overlap with compute and the main thread never blocks on the
        # (possibly slow) host link.  Items: np.ndarray (ready), a
        # device frame (1,H,W,C), or (batch_dev, j) for batched mids —
        # the last converted batch is memoized so each batch transfers
        # once.
        batch_cache: dict = {"dev": None, "u8": None}

        def conv(x):
            if isinstance(x, np.ndarray):
                return x
            if isinstance(x, tuple):
                dev, j = x
                if batch_cache["dev"] is not dev:
                    batch_cache["dev"] = dev
                    batch_cache["u8"] = to_u8_host(dev)
                return batch_cache["u8"][j]
            return to_u8_host(x)[0]

        try:
            while True:
                item = write_q.get()
                if item is None:
                    break
                frame, orig = item
                u8 = conv(frame)
                if job.montage and orig is not None:
                    u8 = np.concatenate([conv(orig), u8], axis=1)
                writer.write(u8)
                stats["frames_out"] += 1
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

    def to_u8_host(frame_dev) -> np.ndarray:
        """Jitted crop+clip+u8 then ONE host fetch; returns (B,h,w,3) u8."""
        return np.asarray(_post_graph(frame_dev.shape, pad)(frame_dev))

    def emit(frame, orig=None):
        write_q.put((frame, orig if job.montage else None))

    def device_frame(np_frame):
        # uint8 frames ship 4x fewer bytes over the host->device link;
        # normalize + pad runs fused on device.  Alongside the device
        # upload, compute the 32x32 host-side scene-gate probe (numpy,
        # microseconds) so the steady-state loop never syncs on device.
        if np_frame.dtype == np.uint8:
            _prep, p0 = _prep_graph(np_frame.shape, mult, engine.compute_dtype)
            dev = _prep(jnp.asarray(np_frame))
        else:
            dev, p0 = pad_to_multiple(jnp.asarray(np_frame[None]), mult)
        sm = probe_small(np_frame, (p0.top, p0.bottom, p0.left, p0.right))
        return dev, p0, sm

    def interpolate_gap(a, b):
        if job.use_timestep and engine.supports_timestep:
            return timestep_frames(engine, a, b, n_out_per_gap, job.tta)
        return midpoint_tree(engine, a, b, n_out_per_gap, job.tta)

    def center_crop_montage(np_frame):
        # Reference montages the CENTER HALF of the source
        # (inference_video.py:196-205: left = w//4, w = w//2, applied to
        # every read frame) — the model runs on the cropped frames.
        w = np_frame.shape[1]
        left = w // 4
        return np_frame[:, left:left + w // 2]

    # --- ordered emission with deferred (batched) gap midpoints --------
    # For the common 2X case (exp==1, one midpoint per gap) consecutive
    # plain gaps are stacked into one batched device call — this is what
    # lets the chip run at its batch-4 throughput instead of batch-1
    # (BASELINE.md north star).  Gate hits and end-of-stream flush.
    use_batching = (n_out_per_gap == 1 and not job.tta and not job.montage
                    and not (job.use_timestep and engine.supports_timestep)
                    and job.batch > 1)
    plan: list = []  # ('dev', frame, orig) | ('pend', idx)
    pending: list = []  # (I0, I1) awaiting a batched midpoint
    resolved: dict = {}

    def drain_plan(force=False):
        while plan:
            kind = plan[0][0]
            if kind == "dev":
                _, fr, orig = plan.pop(0)
                emit(fr, orig)
            else:
                _, idx, orig = plan[0]
                if idx not in resolved:
                    if not force:
                        return
                    flush_pending()
                    continue
                plan.pop(0)
                emit(resolved.pop(idx), orig)

    def flush_pending():
        if not pending:
            return
        # Pad short flushes up to the full batch (repeat the last pair) so
        # every flush hits the same compiled shape bucket.
        k = len(pending)
        items = pending + [pending[-1]] * (job.batch - k)
        i0s = jnp.concatenate([p[1] for p in items], 0)
        i1s = jnp.concatenate([p[2] for p in items], 0)
        mids = engine.interpolate(i0s, i1s, 0.5, job.tta)
        for j, (idx, _, _) in enumerate(pending):
            resolved[idx] = (mids, j)  # converted batch-at-once in writer
        pending.clear()

    pend_counter = [0]

    def queue_gap(a, b, orig):
        if not use_batching:
            for m in interpolate_gap(a, b):
                plan.append(("dev", m, orig))
            drain_plan()
            return
        idx = pend_counter[0]
        pend_counter[0] += 1
        pending.append((idx, a, b))
        plan.append(("pend", idx, orig))
        if len(pending) >= job.batch:
            flush_pending()
        drain_plan()

    def queue_frame(fr, orig=None):
        plan.append(("dev", fr, orig))
        drain_plan()

    def read_next():
        fr = read_q.get()
        if fr is None:
            return None
        stats["frames_in"] += 1
        if job.montage:
            fr = center_crop_montage(fr)
        return fr

    # Main loop mirrors the reference's temp/break_flag contract
    # (inference_video.py:213-274): per iteration write the SOURCE frame
    # (`src`, ref `lastframe`) then the gap's midpoints; on a static pair
    # (ssim > 0.996) read one frame ahead, synthesize inference(I0, next)
    # as a REPLACEMENT for the duplicate (it is both written in place of
    # the duplicate and used as I0 of the next gap), re-run the scene-cut
    # gate on the synthesized frame, and process the read-ahead frame
    # normally next iteration (carried in `temp`).  At end-of-stream
    # inside the static branch, synthesize against the duplicate itself
    # and terminate after the gap (`break_flag`) — never re-read the
    # drained queue (round-1 deadlock).
    last = read_next()
    if last is None:
        write_q.put(None)
        wt.join()
        return stats
    I1, pad, sm1 = device_frame(last)
    src = I1        # device frame pending emission as the next source frame
    temp = None     # device read-ahead carried out of a static gate
    sm_temp = None  # its host probe

    while True:
        if temp is not None:
            I0, I1 = I1, temp
            sm0, sm1 = sm1, sm_temp
            temp = None
        else:
            nxt = read_next()
            if nxt is None:
                break
            I0, sm0 = I1, sm1
            I1, _, sm1 = device_frame(nxt)

        s = ssim_probe(sm0, sm1)  # host-side: no device round-trip
        break_flag = False
        if s > STATIC_SSIM:
            stats["static"] += 1
            after = read_next()
            if after is None:
                break_flag = True
                nxt_dev = I1  # duplicate itself (ref: frame = lastframe)
            else:
                nxt_dev, _, sm_temp = device_frame(after)
                temp = nxt_dev
            I1 = engine.interpolate(I0, nxt_dev, 0.5, job.tta)
            # synthesized frame exists only on device: one tiny 32x32
            # fetch (rare branch), then the gate re-check runs host-side
            sm1 = np.asarray(_small_fn()(I1))
            s = ssim_probe(sm0, sm1)

        queue_frame(src, src)
        if s < SCENE_SSIM:
            stats["scene_cut"] += 1
            for _ in range(n_out_per_gap):
                plan.append(("dev", I0, src))
            drain_plan()
        else:
            queue_gap(I0, I1, src)
        src = I1
        if break_flag:
            break

    queue_frame(src, src)
    drain_plan(force=True)
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
