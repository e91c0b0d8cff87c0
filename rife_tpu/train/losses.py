"""Auxiliary training losses (reference model/loss.py).

LapLoss — the actual training objective (model/RIFE.py:77-81) — lives in
rife_tpu.ops.pyramid.  Here: EPE (loss.py:10-17), the ternary census
loss (loss.py:20-55) and the Sobel gradient loss (loss.py:58-81), all as
pure jnp with the convs expressed as shifted-slice sums / patch
extraction that XLA fuses on the VPU.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def epe_loss(flow: jnp.ndarray, gt: jnp.ndarray, loss_mask: jnp.ndarray) -> jnp.ndarray:
    """Masked endpoint error; flow/gt NHWC with 2 channels."""
    err = jnp.sqrt(jnp.sum((flow - gt) ** 2, axis=-1, keepdims=True) + 1e-6)
    return err * loss_mask


def _rgb_to_gray(img: jnp.ndarray) -> jnp.ndarray:
    # ITU-R 601 luma on [0,1] RGB, scaled back to [0,255] like the
    # reference census transform expects (loss.py:36-39).
    r, g, b = img[..., 0:1], img[..., 1:2], img[..., 2:3]
    return (0.2989 * r + 0.587 * g + 0.114 * b) * 255.0


def _census_transform(gray: jnp.ndarray, patch: int = 7) -> jnp.ndarray:
    """7x7 neighborhood differences, soft-normalized (loss.py:41-44)."""
    pad = patch // 2
    padded = jnp.pad(gray, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    n, h, w, _ = gray.shape
    # Stack the 49 shifted neighborhoods along channels (identity-eye
    # conv in the reference, loss.py:25-34).
    shifts = []
    for dy in range(patch):
        for dx in range(patch):
            shifts.append(padded[:, dy : dy + h, dx : dx + w, :])
    patches = jnp.concatenate(shifts, axis=-1)
    diff = patches - gray
    return diff / jnp.sqrt(0.81 + diff**2)


def _valid_mask(like: jnp.ndarray, pad: int) -> jnp.ndarray:
    n, h, w, _ = like.shape
    inner = jnp.ones((n, h - 2 * pad, w - 2 * pad, 1), like.dtype)
    return jnp.pad(inner, ((0, 0), (pad, pad), (pad, pad), (0, 0)))


def ternary_loss(img0: jnp.ndarray, img1: jnp.ndarray) -> jnp.ndarray:
    """Census/ternary photometric distance (loss.py:20-55)."""
    t0 = _census_transform(_rgb_to_gray(img0))
    t1 = _census_transform(_rgb_to_gray(img1))
    dist = (t0 - t1) ** 2
    dist_norm = dist / (0.1 + dist)
    dist_sum = jnp.sum(dist_norm, axis=-1, keepdims=True)
    mask = _valid_mask(img0, 1)
    return jnp.mean(dist_sum * mask)


_SOBEL_X = np.array([[1, 0, -1], [2, 0, -2], [1, 0, -1]], dtype=np.float32)
_SOBEL_Y = _SOBEL_X.T


def _sobel_filter(x: jnp.ndarray, k: np.ndarray) -> jnp.ndarray:
    padded = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    n, h, w, c = x.shape
    acc = 0.0
    for dy in range(3):
        for dx in range(3):
            if k[dy, dx] != 0:
                acc = acc + k[dy, dx] * padded[:, dy : dy + h, dx : dx + w, :]
    return acc


def sobel_loss(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """L1 between Sobel gradients of pred and gt (loss.py:58-81); used as
    flow smoothness by v4.25's update (train_log/RIFE_HDv3.py:74)."""
    gx = jnp.abs(_sobel_filter(pred, _SOBEL_X) - _sobel_filter(gt, _SOBEL_X))
    gy = jnp.abs(_sobel_filter(pred, _SOBEL_Y) - _sobel_filter(gt, _SOBEL_Y))
    return jnp.mean(gx + gy)
