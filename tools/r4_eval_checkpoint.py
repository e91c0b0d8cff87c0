"""r4: evaluate a trained checkpoint through the real benchmark CLI and
the serving configs (VERDICT r3 next #4).

Builds a held-out synthetic triplet set in the Vimeo90K directory
layout (no dataset is mounted in this environment), then runs the
actual `cli.benchmarks vimeo90k` protocol over it with the trained
checkpoint at exact-f32, bf16, and fast+bf16 — the deltas qualify the
serving configs on a REAL trained model rather than a brief overfit.

    python tools/r4_eval_checkpoint.py <ckpt_dir> [--platform cpu]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_fixture(root: str, n: int = 32, seed: int = 777):
    import cv2
    import numpy as np

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from rife_tpu.data import SyntheticTriplets

    ds = SyntheticTriplets(n=n, h=256, w=448, seed=seed)
    items = []
    for i in range(n):
        img0, gt, img1, _ = ds.load(i)
        d = os.path.join(root, "sequences", f"{i:05d}", "0001")
        os.makedirs(d, exist_ok=True)
        for name, img in (("im1", img0), ("im2", gt), ("im3", img1)):
            cv2.imwrite(os.path.join(d, f"{name}.png"), img)
        items.append(f"{i:05d}/0001")
    with open(os.path.join(root, "tri_testlist.txt"), "w") as f:
        f.write("\n".join(items) + "\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt_dir")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--n", type=int, default=32)
    ap.add_argument("--configs", default=None,
                    help="comma-separated subset of config labels (e.g. "
                         "'exact-f32,exact-bf16,fast-bf16' for families "
                         "without a refine stage, like v4.25)")
    args = ap.parse_args()
    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
        import jax

        jax.config.update("jax_platforms", args.platform)

    root = "/tmp/r4_eval_vimeo_fixture"
    if not os.path.exists(os.path.join(root, "tri_testlist.txt")):
        build_fixture(root, n=args.n)

    from rife_tpu.cli.benchmarks import main as bench_main

    wanted = set(args.configs.split(",")) if args.configs else None
    results = {}
    for label, extra in (
        ("exact-f32", ["--dtype", "float32"]),
        ("exact-bf16", ["--dtype", "bfloat16"]),
        ("fast-f32", ["--dtype", "float32", "--fast", "1"]),
        ("fast-bf16", ["--dtype", "bfloat16", "--fast", "1"]),
        # rung 2 of the ladder (half-res refine) — the real-checkpoint
        # qualification evidence for fast_refine (r5)
        ("fast2-f32", ["--dtype", "float32", "--fast", "2"]),
        ("fast2-bf16", ["--dtype", "bfloat16", "--fast", "2"]),
        # rung 3 (half-res final flow level) — r5 ladder qualification
        ("fast3-f32", ["--dtype", "float32", "--fast", "3"]),
        ("fast3-bf16", ["--dtype", "bfloat16", "--fast", "3"]),
        # rung 4 (refine stage off — the reference v4.25 fastmode analog)
        ("fast4-bf16", ["--dtype", "bfloat16", "--fast", "4"]),
    ):
        if wanted is not None and label not in wanted:
            continue
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            bench_main(["vimeo90k", "--root", root,
                        "--modelDir", args.ckpt_dir] + extra)
        line = [l for l in buf.getvalue().splitlines() if l.startswith("{")][-1]
        results[label] = json.loads(line)
        print(label, line, flush=True)
    base = results["exact-f32"]["psnr"]
    for label in ("exact-bf16", "fast-f32", "fast-bf16", "fast2-f32",
                  "fast2-bf16", "fast3-f32", "fast3-bf16", "fast4-bf16"):
        if label not in results:
            continue
        print(f"delta {label} vs exact-f32: "
              f"{results[label]['psnr'] - base:+.4f} dB", flush=True)
    out = os.path.join(args.ckpt_dir, "eval_protocol.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out}", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
