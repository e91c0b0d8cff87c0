"""Image-pair interpolation CLI (parity with reference inference_img.py).

    python -m rife_tpu.cli.interp_img --img a.png b.png --exp 4
    python -m rife_tpu.cli.interp_img --img a.png b.png --ratio 0.375

Flags mirror inference_img.py:15-21: --exp gives 2^exp - 1 intermediates
by whole-list midpoint doubling, --ratio bisects to an arbitrary t
(rthreshold/rmaxcycles contract, inference_img.py:70-93).  EXR pairs are
processed and written as half floats.
"""
from __future__ import annotations

import argparse
import os

import jax.numpy as jnp
import numpy as np

from rife_tpu.engine import InferenceEngine, bisect_to_ratio, exp_doubling, load_checkpoint
from rife_tpu.ops import pad_to_multiple
from rife_tpu.utils import read_image, write_image


def build_engine(model_path: str | None, model: str | None, scale: float = 1.0,
                 dtype: str = "float32", fast: bool = False) -> InferenceEngine:
    if model_path and os.path.exists(model_path):
        name, params = load_checkpoint(model_path, model)
    else:
        name, params = (model or "rife"), None
    return InferenceEngine(name, params, compute_dtype=jnp.dtype(dtype),
                           scale=scale, fast=fast)


def main(argv=None):
    from rife_tpu.cli._common import enable_compilation_cache

    enable_compilation_cache()

    ap = argparse.ArgumentParser(description="frame interpolation for a pair of images")
    ap.add_argument("--img", nargs=2, required=True)
    ap.add_argument("--exp", type=int, default=4)
    ap.add_argument("--ratio", type=float, default=0.0,
                    help="inference ratio between two images with 0 - 1 range")
    ap.add_argument("--rthreshold", type=float, default=0.02,
                    help="returns image when actual ratio falls in given range threshold")
    ap.add_argument("--rmaxcycles", type=int, default=8,
                    help="limit max number of bisectional cycles")
    from rife_tpu.models.registry import MODEL_REGISTRY

    ap.add_argument("--model", type=str, default=None,
                    choices=sorted(MODEL_REGISTRY), help="model preset")
    ap.add_argument("--modelDir", type=str, default="train_log",
                    help="directory or file with trained model checkpoint")
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--dtype", type=str, default="float32", choices=["float32", "bfloat16"])
    ap.add_argument("--output", type=str, default="output")
    args = ap.parse_args(argv)

    ckpt = args.modelDir
    if os.path.isdir(ckpt):
        for cand in ("flownet.rtpu", "flownet.pkl"):
            p = os.path.join(ckpt, cand)
            if os.path.exists(p):
                ckpt = p
                break
    engine = build_engine(ckpt if os.path.isfile(ckpt) else None, args.model,
                          args.scale, args.dtype)

    try:
        img0_np, exr0 = read_image(args.img[0])
        img1_np, exr1 = read_image(args.img[1])
    except FileNotFoundError as e:
        ap.error(f"cannot read input image: {e}")
    is_exr = exr0 and exr1
    mult = engine.pad_multiple
    img0, pad = pad_to_multiple(jnp.asarray(img0_np[None]), mult)
    img1, _ = pad_to_multiple(jnp.asarray(img1_np[None]), mult)

    if args.ratio:
        mid = bisect_to_ratio(engine, img0, img1, args.ratio,
                              threshold=args.rthreshold, max_cycles=args.rmaxcycles)
        img_list = [img0, mid, img1]
    else:
        img_list = exp_doubling(engine, [img0, img1], args.exp)

    os.makedirs(args.output, exist_ok=True)
    for i, im in enumerate(img_list):
        out = np.asarray(pad.crop(im)[0], dtype=np.float32)
        name = os.path.join(args.output, f"img{i}.exr" if is_exr else f"img{i}.png")
        write_image(name, out, is_exr)
    print(f"wrote {len(img_list)} frames to {args.output}/")


if __name__ == "__main__":
    main()
