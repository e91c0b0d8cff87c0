"""Minimal demo (the reference ships a Colab notebook; this is the
script equivalent): interpolate a midpoint between two frames and write
a side-by-side strip plus a small slow-motion mp4.

    python examples/demo.py I0.png I1.png [--out demo_out]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("img0")
    ap.add_argument("img1")
    ap.add_argument("--out", default="demo_out")
    ap.add_argument("--modelDir", default="train_log")
    args = ap.parse_args()

    import numpy as np
    import jax.numpy as jnp

    from rife_tpu.cli.interp_img import build_engine
    from rife_tpu.engine import exp_doubling
    from rife_tpu.ops import pad_to_multiple
    from rife_tpu.utils import read_image, write_image

    ckpt = os.path.join(args.modelDir, "flownet.rtpu")
    if not os.path.exists(ckpt):
        ckpt = os.path.join(args.modelDir, "flownet.pkl")
    engine = build_engine(ckpt if os.path.exists(ckpt) else None, None)

    i0, _ = read_image(args.img0)
    i1, _ = read_image(args.img1)
    a, pad = pad_to_multiple(jnp.asarray(i0[None]), engine.pad_multiple)
    b, _ = pad_to_multiple(jnp.asarray(i1[None]), engine.pad_multiple)

    mid = np.asarray(pad.crop(engine.interpolate(a, b))[0], np.float32)
    os.makedirs(args.out, exist_ok=True)
    write_image(os.path.join(args.out, "mid.png"), mid)
    strip = np.concatenate([i0, mid, i1], axis=1)
    write_image(os.path.join(args.out, "strip.png"), strip)

    frames = exp_doubling(engine, [a, b], 3)
    try:
        from rife_tpu.serve.services import _encode_frames

        _encode_frames([np.asarray(pad.crop(f)[0], np.float32) for f in frames],
                       os.path.join(args.out, "slomo.mp4"), fps=8)
        print(f"wrote {args.out}/mid.png, strip.png, slomo.mp4")
    except Exception as e:
        print(f"wrote {args.out}/mid.png, strip.png (video encode unavailable: {e})")


if __name__ == "__main__":
    main()
