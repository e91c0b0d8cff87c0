"""Checkpoint converter: move weights between this framework and the
reference torch ecosystem in either direction.

    # reference flownet.pkl (or legacy trio dir) -> native checkpoint
    python -m rife_tpu.cli.convert --input train_log/flownet.pkl \
        --output rife.ckpt

    # native checkpoint (or fresh init) -> reference flownet.pkl
    python -m rife_tpu.cli.convert --input rife.ckpt \
        --output flownet.pkl --to torch

Import direction supports every reference format the loader cascade
knows (paper/RIFEm/2R, v4.25, HDv2, HD v1 trio dirs); export covers the
trainable paper family (torch_export.export_ifnet).
"""
from __future__ import annotations

import argparse


def main(argv=None):
    ap = argparse.ArgumentParser(description="convert checkpoints")
    ap.add_argument("--input", required=True,
                    help="native .ckpt, torch .pkl, or legacy trio dir")
    ap.add_argument("--output", required=True)
    ap.add_argument("--to", choices=("native", "torch"), default="native")
    ap.add_argument("--model", default=None,
                    help="model name override (default: auto-detect)")
    args = ap.parse_args(argv)

    from rife_tpu.engine.checkpoint import load_checkpoint, save_params

    name, params = load_checkpoint(args.input, model=args.model)

    if args.to == "native":
        save_params(args.output, params, meta={"model": name})
        print(f"wrote {args.output} (model={name})")
        return

    if name not in ("rife", "rife_m", "rife_2r"):
        raise SystemExit(
            f"torch export supports the paper family (rife/rife_m/rife_2r); "
            f"checkpoint is '{name}'")
    from rife_tpu.models.torch_export import export_ifnet, save_torch_pickle

    save_torch_pickle(args.output, export_ifnet(params))
    print(f"wrote {args.output} (reference state dict, model={name})")


if __name__ == "__main__":
    main()
