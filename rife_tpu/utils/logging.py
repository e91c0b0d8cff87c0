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

    def close(self):
        self.f.close()
        if self.tb is not None:
            self.tb.close()
