"""Summarize a cli/train metrics.jsonl into a markdown report
(loss curve table, validation PSNR, input-pipeline timing) for docs/.

    python tools/r4_curve.py train_log_r4 docs/TRAINING_RUN_R4.md
"""
import json
import os
import sys


def main(log_dir: str, out_md: str, title: str):
    rows, vals = [], []
    with open(os.path.join(log_dir, "metrics.jsonl")) as f:
        for line in f:
            r = json.loads(line)
            if r.get("tag") == "train":
                rows.append(r)
            elif r.get("tag") == "validate":
                vals.append(r)

    def fmt(x, nd=4):
        return f"{x:.{nd}f}" if isinstance(x, (int, float)) else str(x)

    lines = [f"# {title}", ""]
    lines.append("Harvested from `metrics.jsonl` by tools/r4_curve.py; the "
                 "raw JSONL + TensorBoard events + image panels live in the "
                 "same log dir.")
    lines.append("")
    lines.append("## Training loss (every 200 steps)")
    lines.append("")
    keys = [k for k in ("loss", "loss_l1", "loss_tea", "loss_distill",
                        "loss_ter", "loss_cons", "loss_smooth")
            if rows and k in rows[0]]
    stride = max(1, len(rows) // 40)  # keep the table readable
    rows = rows[::stride] + ([rows[-1]] if stride > 1 else [])
    lines.append("| step | " + " | ".join(keys) + " | lr | t_data (s) |")
    lines.append("|" + "---|" * (len(keys) + 3))
    for r in rows:
        lines.append("| " + str(r["step"]) + " | "
                     + " | ".join(fmt(r[k]) for k in keys)
                     + f" | {r['lr']:.2e} | {fmt(r.get('t_data', 0))} |")
    if vals:
        lines.append("")
        lines.append("## Validation PSNR (held-out split)")
        lines.append("")
        lines.append("| step | psnr | psnr_teacher |")
        lines.append("|---|---|---|")
        for v in vals:
            lines.append(f"| {v['step']} | {fmt(v['psnr'])} | "
                         f"{fmt(v.get('psnr_tea', v['psnr']))} |")
    with open(out_md, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote", out_md, f"({len(rows)} train rows, {len(vals)} val rows)")


if __name__ == "__main__":
    log_dir = sys.argv[1] if len(sys.argv) > 1 else "train_log_r4"
    out_md = sys.argv[2] if len(sys.argv) > 2 else "docs/TRAINING_RUN_R4.md"
    title = sys.argv[3] if len(sys.argv) > 3 else (
        "Round-4 real-chip training run (3000 steps, bf16, batch 16, "
        "224², one v5e)")
    main(log_dir, out_md, title)
