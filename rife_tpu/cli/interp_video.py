"""Video interpolation CLI (parity with reference inference_video.py:56-297).

    python -m rife_tpu.cli.interp_video --video in.mp4 --exp 1
    python -m rife_tpu.cli.interp_video --img framedir/ --exp 2 --png

Flags mirror the reference: --video/--img, --exp or --fps, --scale with
--UHD implying 0.5, --png, --montage, --skip (deprecated no-op there,
accepted here), --ext, --output, --model.  Default output name is
{base}_{2^exp}X_{fps}fps.{ext}; an explicit --fps drops audio
(inference_video.py:128-131,151).
"""
from __future__ import annotations

import argparse
import os

import jax.numpy as jnp

from rife_tpu.video import (
    PngDirReader,
    PngDirWriter,
    VideoJob,
    VideoReader,
    VideoWriter,
    interpolate_video,
    transfer_audio,
)


def main(argv=None):
    from rife_tpu.cli._common import enable_compilation_cache

    enable_compilation_cache()

    ap = argparse.ArgumentParser(description="interpolation for a video")
    ap.add_argument("--video", type=str, default=None)
    ap.add_argument("--img", type=str, default=None, help="numbered-png frame directory")
    ap.add_argument("--output", type=str, default=None)
    ap.add_argument("--montage", action="store_true")
    ap.add_argument("--UHD", action="store_true", help="support 4k video; implies --scale 0.5")
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--skip", action="store_true",
                    help="deprecated flag kept for compatibility (no-op)")
    ap.add_argument("--fps", type=float, default=None)
    ap.add_argument("--png", action="store_true", help="write png frames instead of video")
    ap.add_argument("--ext", type=str, default="mp4")
    ap.add_argument("--exp", type=int, default=1)
    ap.add_argument("--tta", action="store_true")
    from rife_tpu.models.registry import MODEL_REGISTRY
    ap.add_argument("--model", type=str, default=None, choices=sorted(MODEL_REGISTRY))
    ap.add_argument("--modelDir", type=str, default="train_log")
    ap.add_argument("--dtype", type=str, default="bfloat16", choices=["float32", "bfloat16"])
    # fast is the DEFAULT serving graph: protocol-qualified at < 0.05 dB
    # vs exact-f32 with trained weights (tests/test_benchmarks_golden.py
    # test_fast_serving_psnr_cost_trained_weights; docs/PERFORMANCE.md
    # "Fast-mode qualification").  --exact opts back into the bit-exact
    # full-resolution graph.
    ap.add_argument("--fast", dest="fast", type=int, nargs="?", const=1,
                    default=1,
                    help="fast-rung ladder: 1 = coarse-level warps at "
                         "consumer resolution (default; qualified "
                         "< 0.05 dB vs exact), 2 = + half-res refine")
    ap.add_argument("--exact", dest="fast", action="store_const", const=0,
                    help="bit-exact full-res graph (reference parity mode)")
    args = ap.parse_args(argv)

    assert args.video is not None or args.img is not None, "need --video or --img"
    if args.UHD and args.scale == 1.0:
        args.scale = 0.5
    assert args.scale in (0.25, 0.5, 1.0, 2.0, 4.0)
    if args.skip:
        print("skip flag is abandoned, please refer to issue #207.")

    from rife_tpu.cli.interp_img import build_engine

    ckpt = args.modelDir
    if os.path.isdir(ckpt):
        for cand in ("flownet.rtpu", "flownet.pkl"):
            p = os.path.join(ckpt, cand)
            if os.path.exists(p):
                ckpt = p
                break
    engine = build_engine(ckpt if os.path.isfile(ckpt) else None, args.model,
                          args.scale, args.dtype, fast=args.fast)

    if args.video:
        try:
            reader = VideoReader(args.video, dtype="uint8")
        except FileNotFoundError:
            ap.error(f"cannot open video: {args.video}")
        base = os.path.splitext(os.path.basename(args.video))[0]
    else:
        reader = PngDirReader(args.img)
        base = "frames"
        args.png = True

    mult = 1 << args.exp
    out_fps = args.fps if args.fps else reader.fps * mult
    if args.output:
        out_path = args.output
    elif args.png:
        out_path = "vid_out"
    else:
        out_path = f"{base}_{mult}X_{int(round(out_fps))}fps.{args.ext}"

    if args.png:
        writer = PngDirWriter(out_path)
    else:
        w = reader.width * (2 if args.montage else 1)
        writer = VideoWriter(out_path, out_fps, w, reader.height)

    job = VideoJob(exp=args.exp, scale=args.scale, montage=args.montage, tta=args.tta,
                   use_timestep=engine.supports_timestep)
    stats = interpolate_video(engine, reader, writer, job)
    writer.close()

    if args.video and not args.png and args.fps is None:
        print(transfer_audio(args.video, out_path))
    print(stats)


if __name__ == "__main__":
    main()
