"""Training-image observability (reference train.py:29-37,75-87).

The reference dumps TensorBoard image panels every 1000 steps: for the
first 5 batch elements, `{i}/img` = merged_teacher|pred|gt side by side,
`{i}/flow` = flow2rgb(student)|flow2rgb(teacher), `{i}/mask` =
mask|mask_tea.  This module reproduces those panels from the jitted
train step's vis outputs, writing to TensorBoard when available and
always dumping PNGs (the air-gapped analog of an event viewer).

All functions are host-side numpy: panels are built from already-fetched
arrays, never inside jit.
"""
from __future__ import annotations

import os

import numpy as np


def flow_to_rgb(flow: np.ndarray) -> np.ndarray:
    """Flow field -> displayable RGB in [0, 1].

    Same formula as the reference's flow2rgb (train.py:29-37): normalize
    by the max |u|, shift a white canvas by (+u, -(u+v)/2, +v).  Accepts
    (H, W, 2+) and uses the first two channels for the shift while
    normalizing by the full array's max magnitude, matching the
    reference's behavior when handed a 4-channel bidirectional flow.
    """
    h, w = flow.shape[:2]
    flow = np.asarray(flow, np.float32)
    denom = np.abs(flow).max()
    nf = flow / (denom if denom > 0 else 1.0)
    rgb = np.ones((h, w, 3), np.float32)
    rgb[:, :, 0] += nf[:, :, 0]
    rgb[:, :, 1] -= 0.5 * (nf[:, :, 0] + nf[:, :, 1])
    rgb[:, :, 2] += nf[:, :, 1]
    return rgb.clip(0.0, 1.0)


def _u8(x: np.ndarray) -> np.ndarray:
    return (np.clip(np.asarray(x, np.float32), 0.0, 1.0) * 255).astype(np.uint8)


def build_panels(vis: dict, n: int = 5) -> dict[str, np.ndarray]:
    """Build `{tag: HWC uint8}` panels from a train-step vis dict.

    vis keys (all NHWC numpy/jax arrays in [0,1] except flows):
      pred, gt, merged_tea, mask (N,H,W,1), mask_tea, flow (N,H,W,2+),
      flow_tea.
    """
    pred = np.asarray(vis["pred"])
    gt = np.asarray(vis["gt"])
    tea = np.asarray(vis["merged_tea"])
    mask = np.asarray(vis["mask"])
    mask_t = np.asarray(vis["mask_tea"])
    flow = np.asarray(vis["flow"])
    flow_t = np.asarray(vis["flow_tea"])
    panels = {}
    for i in range(min(n, pred.shape[0])):
        panels[f"{i}/img"] = _u8(np.concatenate([tea[i], pred[i], gt[i]], 1))
        panels[f"{i}/flow"] = _u8(
            np.concatenate([flow_to_rgb(flow[i]), flow_to_rgb(flow_t[i])], 1))
        m = np.concatenate([mask[i], mask_t[i]], 1)
        panels[f"{i}/mask"] = np.repeat(_u8(m), 3, axis=-1)
    return panels


def dump_panels(logger, step: int, vis: dict, n: int = 5) -> list[str]:
    """Write panels via a MetricLogger (TB add_image + PNG dump).

    Returns the PNG paths written (for tests / humans without TB).
    """
    paths = []
    for tag, img in build_panels(vis, n=n).items():
        paths.append(logger.log_image(tag, step, img))
    return paths


def save_png(path: str, img_u8: np.ndarray) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    try:
        from PIL import Image

        Image.fromarray(img_u8).save(path)
    except Exception:
        import cv2

        cv2.imwrite(path, img_u8[..., ::-1])
