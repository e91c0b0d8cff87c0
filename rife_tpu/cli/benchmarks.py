"""Benchmark harness: the reference's de-facto regression suite
(benchmark/*.py, SURVEY.md §2.5) as one CLI with exact metric protocols.

    python -m rife_tpu.cli.benchmarks vimeo90k   --root vimeo_triplet
    python -m rife_tpu.cli.benchmarks ucf101     --root UCF101/ucf101_interp_ours
    python -m rife_tpu.cli.benchmarks middlebury --root other-data --gt other-gt-interp
    python -m rife_tpu.cli.benchmarks hd         --root HD_dataset
    python -m rife_tpu.cli.benchmarks hd4x       --root HD_dataset
    python -m rife_tpu.cli.benchmarks atd12k     --root datasets/test_2k_540p
    python -m rife_tpu.cli.benchmarks testtime

Protocol notes are cited inline; published targets live in BASELINE.md.
"""
from __future__ import annotations

import argparse
import json
import math
import os
import time

import numpy as np

import jax.numpy as jnp

from rife_tpu.engine import InferenceEngine
from rife_tpu.metrics import interpolation_error, psnr_uint8_protocol, rgb_to_y
from rife_tpu.ops import ssim_matlab
from rife_tpu.utils import read_image


def _engine(args, default_model: str | None = None) -> InferenceEngine:
    """`default_model` applies only when NO checkpoint file resolves —
    with a checkpoint present and --model unset, auto-detection decides
    (so e.g. hd4x can verify the loaded model is timestep-conditioned
    instead of silently forcing rife_m onto rife weights)."""
    from rife_tpu.cli.interp_img import build_engine

    ckpt = args.modelDir
    if os.path.isdir(ckpt):
        for cand in ("flownet.rtpu", "flownet.pkl"):
            p = os.path.join(ckpt, cand)
            if os.path.exists(p):
                ckpt = p
                break
    ckpt_file = ckpt if os.path.isfile(ckpt) else None
    model = args.model if args.model else (None if ckpt_file else default_model)
    return build_engine(ckpt_file, model,
                        args.scale, args.dtype, fast=getattr(args, "fast", False))


def _ssim_rounded(gt01: np.ndarray, pred01: np.ndarray) -> float:
    """ssim_matlab(gt, round(pred*255)/255) (benchmark/Vimeo90K.py:34)."""
    pred_r = np.round(np.clip(pred01, 0, 1) * 255.0) / 255.0
    return float(ssim_matlab(jnp.asarray(gt01[None]), jnp.asarray(pred_r[None]),
                             val_range=1.0))


def _triplet_bench(engine, triplets, pad_hw=None):
    """Shared PSNR/SSIM loop; triplets yields (img0, gt, img1) float01 HWC."""
    psnr_list, ssim_list = [], []
    for i, (i0, gt, i1) in enumerate(triplets):
        a = jnp.asarray(i0[None])
        b = jnp.asarray(i1[None])
        pred = np.asarray(engine.interpolate(a, b), dtype=np.float32)[0]
        ssim_list.append(_ssim_rounded(gt, pred))
        pred_r = np.round(np.clip(pred, 0, 1) * 255.0) / 255.0
        mse = float(np.mean((gt - pred_r) ** 2))
        psnr_list.append(-10 * math.log10(mse) if mse > 0 else 100.0)
        if (i + 1) % 50 == 0:
            print(f"[{i+1}] Avg PSNR: {np.mean(psnr_list):.4f} SSIM: {np.mean(ssim_list):.4f}")
    return float(np.mean(psnr_list)), float(np.mean(ssim_list))


def run_vimeo90k(args):
    """Vimeo90K triplet test (benchmark/Vimeo90K.py:14-40)."""
    import cv2

    root = args.root
    with open(os.path.join(root, "tri_testlist.txt")) as f:
        items = [l for l in f.read().splitlines() if l]

    def gen():
        for item in items:
            p = os.path.join(root, "sequences", item)
            i0 = cv2.imread(os.path.join(p, "im1.png")).astype(np.float32) / 255.0
            gt = cv2.imread(os.path.join(p, "im2.png")).astype(np.float32) / 255.0
            i1 = cv2.imread(os.path.join(p, "im3.png")).astype(np.float32) / 255.0
            yield i0, gt, i1  # BGR like the reference feeds cv2 arrays

    p, s = _triplet_bench(engine=_engine(args), triplets=gen())
    print(json.dumps({"benchmark": "vimeo90k", "psnr": p, "ssim": s}))


def run_ucf101(args):
    """UCF101 DVF pairs (benchmark/UCF101.py:19-39)."""
    import cv2

    dirs = sorted(os.listdir(args.root))

    def gen():
        for d in dirs:
            p = os.path.join(args.root, d)
            i0 = cv2.imread(os.path.join(p, "frame_00.png")).astype(np.float32) / 255.0
            i1 = cv2.imread(os.path.join(p, "frame_02.png")).astype(np.float32) / 255.0
            gt = cv2.imread(os.path.join(p, "frame_01_gt.png")).astype(np.float32) / 255.0
            yield i0, gt, i1

    p, s = _triplet_bench(engine=_engine(args), triplets=gen())
    print(json.dumps({"benchmark": "ucf101", "psnr": p, "ssim": s}))


_MIDDLEBURY = ["Beanbags", "Dimetrodon", "DogDance", "Grove2", "Grove3", "Hydrangea",
               "MiniCooper", "RubberWhale", "Urban2", "Urban3", "Venus", "Walking"]


def run_middlebury(args):
    """MiddleBury OTHER IE (benchmark/MiddleBury_Other.py:19-37): inputs are
    zero-padded into a fixed 640x480 canvas, IE on the cropped output."""
    import cv2

    engine = _engine(args)
    ie_list = []
    for name in _MIDDLEBURY:
        i0 = cv2.imread(os.path.join(args.root, name, "frame10.png")).astype(np.float32) / 255.0
        i1 = cv2.imread(os.path.join(args.root, name, "frame11.png")).astype(np.float32) / 255.0
        gt = cv2.imread(os.path.join(args.gt, name, "frame10i11.png"))
        h, w = i0.shape[:2]
        c0 = np.zeros((480, 640, 3), np.float32)
        c1 = np.zeros((480, 640, 3), np.float32)
        c0[:h, :w] = i0
        c1[:h, :w] = i1
        pred = np.asarray(
            engine.interpolate(jnp.asarray(c0[None]), jnp.asarray(c1[None])),
            dtype=np.float32,
        )[0][:h, :w]
        ie_list.append(interpolation_error(pred, gt))
        print(f"{name}: running IE {np.mean(ie_list):.4f}")
    print(json.dumps({"benchmark": "middlebury_other", "ie": float(np.mean(ie_list))}))


def _hd_clips(root):
    # (path, height, width) list (benchmark/HD.py:21-33).
    return [
        (os.path.join(root, "HD720p_GT", n), 720, 1280)
        for n in ("parkrun_1280x720_50.yuv", "shields_1280x720_60.yuv", "stockholm_1280x720_60.yuv")
    ] + [
        (os.path.join(root, "HD1080p_GT", n), 1080, 1920)
        for n in ("BlueSky.yuv", "Kimono1_1920x1080_24.yuv", "ParkScene_1920x1080_24.yuv",
                  "sunflower_1080p25.yuv")
    ] + [
        (os.path.join(root, "HD544p_GT", n), 544, 1280)
        for n in ("Sintel_Alley2_1280x544.yuv", "Sintel_Market5_1280x544.yuv",
                  "Sintel_Temple1_1280x544.yuv", "Sintel_Temple2_1280x544.yuv")
    ]


def _replication_pad_h(img01: np.ndarray, pad: int) -> np.ndarray:
    return np.pad(img01, ((pad, pad), (0, 0), (0, 0)), mode="edge")


def _clip_list(args):
    """--clips "path:h:w,..." overrides the canonical HD clip table
    (benchmark/HD.py:21-33) — used for protocol tests on synthetic clips."""
    if getattr(args, "clips", None):
        out = []
        for spec in args.clips.split(","):
            path, h, w = spec.rsplit(":", 2)
            out.append((path, int(h), int(w)))
        return out
    return _hd_clips(args.root)


def _hd_pad(h: int) -> int:
    return 24 if h == 720 else (4 if h == 1080 else 16)


def run_hd(args):
    """HD 2X midframe Y-PSNR (benchmark/HD.py:21-89): evens->odd midframe
    over the first 100 frames; ReplicationPad 24/4/16 rows by height."""
    from rife_tpu.video.yuv import YUV420Reader

    engine = _engine(args)
    tot = []
    for path, h, w in _clip_list(args):
        if not os.path.exists(path):
            print(f"skip missing {path}")
            continue
        reader = YUV420Reader(path, w, h)
        pad = _hd_pad(h)
        psnr_list = []
        for index in range(0, 100, 2):
            f0 = reader.read_rgb(index)
            gt = reader.read_rgb(index + 1)
            f2 = reader.read_rgb(index + 2)
            if f2 is None or gt is None:
                break
            i0 = _replication_pad_h(f0.astype(np.float32) / 255.0, pad)
            i1 = _replication_pad_h(f2.astype(np.float32) / 255.0, pad)
            pred = np.asarray(
                engine.interpolate(jnp.asarray(i0[None]), jnp.asarray(i1[None])),
                dtype=np.float32,
            )[0][pad:-pad]
            out = np.round(np.clip(pred, 0, 1) * 255.0).astype(np.uint8)
            diff = rgb_to_y(gt / 255.0) * 255 - rgb_to_y(out / 255.0) * 255
            mse = float(np.mean(diff**2))
            psnr_list.append(20 * math.log10(255.0 / math.sqrt(mse)))
        m = float(np.mean(psnr_list))
        print(f"{os.path.basename(path)}: {m:.4f}")
        tot.append(m)
    print(json.dumps({"benchmark": "hd", "psnr_y": float(np.mean(tot))}))


def run_hd4x(args):
    """HD multi-4X with the timestep model (benchmark/HD_multi_4X.py:16-105):
    frames i..i+4, predictions at t=1/4, 2/4, 3/4 vs ground truth."""
    from rife_tpu.video.yuv import YUV420Reader

    engine = _engine(args, default_model="rife_m")
    if not engine.supports_timestep:
        # A checkpoint that auto-detects as plain "rife" would silently
        # compute the midpoint for every t=k/4 (ifnet ignores timestep
        # unless variant="rife_m") — fail loudly instead of publishing
        # a wrong protocol number (round-4 VERDICT weak #6).
        raise SystemExit(
            f"hd4x needs a timestep-conditioned model; loaded "
            f"'{engine.model_name}' is fixed-midpoint. Pass --model "
            "rife_m with a matching checkpoint."
        )
    groups = {}
    for path, h, w in _clip_list(args):
        if not os.path.exists(path):
            print(f"skip missing {path}")
            continue
        reader = YUV420Reader(path, w, h)
        pad = _hd_pad(h)
        psnr_list = []
        for index in range(0, 100, 4):
            f0 = reader.read_rgb(index)
            f4 = reader.read_rgb(index + 4)
            if f4 is None:
                break
            i0 = _replication_pad_h(f0.astype(np.float32) / 255.0, pad)
            i1 = _replication_pad_h(f4.astype(np.float32) / 255.0, pad)
            for k in (1, 2, 3):
                gt = reader.read_rgb(index + k)
                if gt is None:
                    break
                pred = np.asarray(
                    engine.interpolate(jnp.asarray(i0[None]), jnp.asarray(i1[None]),
                                       timestep=k / 4),
                    dtype=np.float32,
                )[0][pad:-pad]
                out = np.round(np.clip(pred, 0, 1) * 255.0).astype(np.uint8)
                diff = rgb_to_y(gt / 255.0) * 255 - rgb_to_y(out / 255.0) * 255
                psnr_list.append(20 * math.log10(255.0 / math.sqrt(float(np.mean(diff**2)))))
        groups.setdefault(h, []).append(float(np.mean(psnr_list)))
        print(f"{os.path.basename(path)}: {groups[h][-1]:.4f}")
    result = {f"psnr_{k}p": float(np.mean(v)) for k, v in groups.items() if v}
    print(json.dumps({"benchmark": "hd_multi_4x", **result}))


def run_atd12k(args):
    """ATD12K anime triplets (benchmark/ATD12K.py:19-42): ReplicationPad
    [0,0,2,2] rows, crop back before metrics."""
    import cv2

    engine = _engine(args)
    dirs = sorted(os.listdir(args.root))
    psnr_list, ssim_list = [], []
    for d in dirs:
        p = os.path.join(args.root, d)
        i0 = cv2.imread(os.path.join(p, "frame1.png")).astype(np.float32) / 255.0
        gt = cv2.imread(os.path.join(p, "frame2.png")).astype(np.float32) / 255.0
        i1 = cv2.imread(os.path.join(p, "frame3.png")).astype(np.float32) / 255.0
        i0p = _replication_pad_h(i0, 2)
        i1p = _replication_pad_h(i1, 2)
        pred = np.asarray(
            engine.interpolate(jnp.asarray(i0p[None]), jnp.asarray(i1p[None])),
            dtype=np.float32,
        )[0][2:-2]
        ssim_list.append(_ssim_rounded(gt, pred))
        pred_r = np.round(np.clip(pred, 0, 1) * 255.0) / 255.0
        mse = float(np.mean((gt - pred_r) ** 2))
        psnr_list.append(-10 * math.log10(mse) if mse > 0 else 100.0)
    print(json.dumps({
        "benchmark": "atd12k",
        "psnr": float(np.mean(psnr_list)),
        "ssim": float(np.mean(ssim_list)),
    }))


def run_testtime(args):
    """Latency probe (benchmark/testtime.py:9-29): 100 warmup + 100 timed
    single-pair inferences at 480x640 (padded to 480x640 already %32)."""
    import jax

    engine = _engine(args)
    i0 = jnp.zeros((1, 480, 640, 3), engine.compute_dtype)
    i1 = jnp.zeros((1, 480, 640, 3), engine.compute_dtype)
    for _ in range(args.warmup):
        out = engine.interpolate(i0, i1)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = engine.interpolate(i0, i1)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / args.iters
    print(json.dumps({"benchmark": "testtime", "seconds_per_frame": dt,
                      "fps": 1.0 / dt}))


def main(argv=None):
    from rife_tpu.cli._common import enable_compilation_cache

    enable_compilation_cache()

    ap = argparse.ArgumentParser(description="rife_tpu benchmark harness")
    sub = ap.add_subparsers(dest="bench", required=True)
    defs = {
        "vimeo90k": run_vimeo90k,
        "ucf101": run_ucf101,
        "middlebury": run_middlebury,
        "hd": run_hd,
        "hd4x": run_hd4x,
        "atd12k": run_atd12k,
        "testtime": run_testtime,
    }
    for name, fn in defs.items():
        p = sub.add_parser(name)
        p.add_argument("--root", type=str, default=".")
        p.add_argument("--gt", type=str, default="other-gt-interp")
        p.add_argument("--model", type=str, default=None)
        p.add_argument("--modelDir", type=str, default="train_log")
        p.add_argument("--scale", type=float, default=1.0)
        p.add_argument("--dtype", type=str, default="float32", choices=["float32", "bfloat16"])
        p.add_argument("--fast", type=int, nargs="?", const=1, default=0,
                       help="measure the fast serving graph at this rung "
                            "(1 = consumer-res coarse warps, 2 = + half-"
                            "res refine; benchmarks default to the exact "
                            "graph for protocol parity)")
        p.add_argument("--clips", type=str, default=None,
                       help="override HD clip table: 'path:h:w,...'")
        p.add_argument("--warmup", type=int, default=100)
        p.add_argument("--iters", type=int, default=100)
        p.set_defaults(fn=fn)
    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
