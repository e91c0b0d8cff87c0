"""Metric logging: JSONL always, TensorBoard when available.

Replaces the reference's SummaryWriter usage (train.py:40-44,70-87) with
a dependency-gated writer: scalars land in {log_dir}/metrics.jsonl and,
if torch.utils.tensorboard imports, in TB event files too.
"""
from __future__ import annotations

import json
import os
import time


class MetricLogger:
    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self.log_dir = log_dir
        self.f = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self.tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self.tb = SummaryWriter(os.path.join(log_dir, "tb"))
        except Exception:
            pass

    def log(self, tag: str, step: int, scalars: dict):
        rec = {"tag": tag, "step": step, "time": time.time(), **scalars}
        self.f.write(json.dumps(rec) + "\n")
        self.f.flush()
        if self.tb is not None:
            for k, v in scalars.items():
                if isinstance(v, (int, float)):
                    self.tb.add_scalar(f"{tag}/{k}", v, step)

    def log_image(self, tag: str, step: int, img_u8) -> str:
        """HWC uint8 image -> TB add_image (if available) + PNG on disk
        (the reference's writer.add_image panels, train.py:75-87)."""
        if self.tb is not None:
            self.tb.add_image(tag, img_u8, step, dataformats="HWC")
            self.tb.flush()
        from rife_tpu.utils.viz import save_png

        path = os.path.join(self.log_dir, "panels",
                            f"step_{step:08d}", tag.replace("/", "_") + ".png")
        save_png(path, img_u8)
        return path

    def close(self):
        self.f.close()
        if self.tb is not None:
            self.tb.close()
