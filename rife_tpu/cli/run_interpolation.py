"""Headless pair->video wrapper (reference rife_app/run_interpolation.py:14-49).

    python -m rife_tpu.cli.run_interpolation img0.png img1.png out.mp4 --passes 4
"""
from __future__ import annotations

import argparse


def main(argv=None):
    from rife_tpu.cli._common import enable_compilation_cache

    enable_compilation_cache()

    ap = argparse.ArgumentParser()
    ap.add_argument("img0")
    ap.add_argument("img1")
    ap.add_argument("output")
    ap.add_argument("--passes", type=int, default=4)
    ap.add_argument("--fps", type=float, default=25.0)
    ap.add_argument("--disk-based", action="store_true")
    ap.add_argument("--modelDir", default="train_log")
    args = ap.parse_args(argv)

    from rife_tpu.serve.app import load_engine
    from rife_tpu.serve.services import interpolate_pair_to_video
    from rife_tpu.utils import read_image

    engine = load_engine(args.modelDir)
    if engine is None:
        raise SystemExit("model failed to load")
    img0, _ = read_image(args.img0)
    img1, _ = read_image(args.img1)
    stats = interpolate_pair_to_video(
        engine, img0, img1, args.output,
        passes=args.passes, fps=args.fps, disk_based=args.disk_based,
    )
    print(stats)


if __name__ == "__main__":
    main()
