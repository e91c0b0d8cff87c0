"""Host-side image IO: PNG/JPG via cv2, EXR half-float support.

Mirrors the reference CLI behaviors (inference_img.py:48-60): images are
RGB float in [0,1] NHWC on device; EXR files bypass the /255 scaling and
are written back as half floats.
"""
from __future__ import annotations

import os

import cv2
import numpy as np


def read_image(path: str) -> tuple[np.ndarray, bool]:
    """Returns (HWC float32 RGB in [0,1] — or raw for EXR, is_exr)."""
    if path.lower().endswith(".exr"):
        img = cv2.imread(path, cv2.IMREAD_COLOR | cv2.IMREAD_ANYDEPTH)
        if img is None:
            raise FileNotFoundError(path)
        return img[..., ::-1].astype(np.float32), True
    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if img is None:
        raise FileNotFoundError(path)
    if img.ndim == 2:
        img = img[..., None].repeat(3, -1)
    if img.shape[-1] == 4:
        img = img[..., :3]
    return img[..., ::-1].astype(np.float32) / 255.0, False


def write_image(path: str, img: np.ndarray, is_exr: bool = False):
    """img: HWC float RGB (in [0,1] unless EXR)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if is_exr or path.lower().endswith(".exr"):
        cv2.imwrite(path, np.ascontiguousarray(img[..., ::-1].astype(np.float16)),
                    [cv2.IMWRITE_EXR_TYPE, cv2.IMWRITE_EXR_TYPE_HALF])
    else:
        cv2.imwrite(path, to_uint8(img)[..., ::-1])


def to_tensor(img: np.ndarray) -> np.ndarray:
    """HWC -> NHWC batch of one."""
    return img[None]


def to_uint8(img: np.ndarray) -> np.ndarray:
    return (np.clip(np.asarray(img), 0, 1) * 255.0).round().astype(np.uint8)
