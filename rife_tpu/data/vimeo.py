"""Vimeo90K triplet input pipeline (reference dataset.py:11-109).

Host-side numpy pipeline feeding the sharded device batch:

- triplets (im1/im2/im3.png, 448x256) listed in tri_trainlist.txt with a
  95/5 train/val split (dataset.py:30-37); tri_testlist.txt for test.
- train augmentation exactly as the reference (dataset.py:70-104):
  random 224x224 crop, channel reversal p=.5, vertical flip p=.5,
  horizontal flip p=.5, temporal order swap with timestep -> 1-timestep
  p=.5, rotation 90/180/270 with p=.25 each.
- batches are uint8 HWC on host, converted to float/255 on device (the
  /255 lives in the jitted step via astype in the loss fn caller).

Multi-host: each process takes a strided shard of the index space,
replacing DistributedSampler (train.py:49).

SyntheticTriplets generates linearly-moving-square sequences so that
training/eval paths are exercisable (and loss-decrease testable) without
the external dataset.
"""
from __future__ import annotations

import os
from typing import Iterator

import numpy as np


class VimeoTriplets:
    def __init__(self, root: str, split: str = "train"):
        self.root = root
        self.image_root = os.path.join(root, "sequences")
        with open(os.path.join(root, "tri_trainlist.txt")) as f:
            trainlist = [l for l in f.read().splitlines() if l]
        cnt = int(len(trainlist) * 0.95)
        if split == "train":
            self.items = trainlist[:cnt]
        elif split == "validation":
            self.items = trainlist[cnt:]
        else:
            with open(os.path.join(root, "tri_testlist.txt")) as f:
                self.items = [l for l in f.read().splitlines() if l]
        self.split = split

    def __len__(self):
        return len(self.items)

    def load(self, index: int):
        import cv2

        p = os.path.join(self.image_root, self.items[index])
        frames = [cv2.imread(os.path.join(p, f"im{i}.png")) for i in (1, 2, 3)]
        if any(f is None for f in frames):
            raise FileNotFoundError(p)
        img0, gt, img1 = frames
        return img0, gt, img1, 0.5


class SyntheticTriplets:
    """Moving-pattern triplets for dataset-free smoke training."""

    def __init__(self, n: int = 256, h: int = 256, w: int = 448, seed: int = 0):
        self.n, self.h, self.w = n, h, w
        self.seed = seed
        self.split = "train"

    def __len__(self):
        return self.n

    def load(self, index: int):
        rng = np.random.default_rng(self.seed * 100003 + index)
        h, w = self.h, self.w
        bg = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        # blur the background a little so warps are learnable
        bg = (bg.astype(np.float32) + np.roll(bg, 1, 0) + np.roll(bg, 1, 1)) / 3
        dx, dy = rng.integers(-12, 13, 2)
        frames = []
        for t in (0, 1, 2):
            img = np.roll(np.roll(bg, int(round(dy * t / 2)), 0), int(round(dx * t / 2)), 1)
            frames.append(img.astype(np.uint8))
        return frames[0], frames[1], frames[2], 0.5


def _augment(img0, gt, img1, timestep, rng: np.random.Generator, crop: int = 224):
    ih, iw, _ = img0.shape
    x = rng.integers(0, ih - crop + 1)
    y = rng.integers(0, iw - crop + 1)
    img0 = img0[x : x + crop, y : y + crop]
    gt = gt[x : x + crop, y : y + crop]
    img1 = img1[x : x + crop, y : y + crop]
    if rng.random() < 0.5:
        img0, gt, img1 = img0[:, :, ::-1], gt[:, :, ::-1], img1[:, :, ::-1]
    if rng.random() < 0.5:
        img0, gt, img1 = img0[::-1], gt[::-1], img1[::-1]
    if rng.random() < 0.5:
        img0, gt, img1 = img0[:, ::-1], gt[:, ::-1], img1[:, ::-1]
    if rng.random() < 0.5:
        img0, img1 = img1, img0
        timestep = 1 - timestep
    p = rng.random()
    if p < 0.25:
        k = 3  # 90 deg clockwise == rot90 k=3 (np.rot90 is counter-clockwise)
    elif p < 0.5:
        k = 2
    elif p < 0.75:
        k = 1
    else:
        k = 0
    if k:
        img0, gt, img1 = (np.rot90(a, k) for a in (img0, gt, img1))
    return img0, gt, img1, timestep


def batch_iterator(dataset, batch_size: int, *, seed: int = 1234, crop: int = 224,
                   process_index: int = 0, process_count: int = 1,
                   epochs: int | None = None, augment: bool | None = None) -> Iterator[dict]:
    """Yields dicts of NHWC float32 batches {img0, img1, gt, timestep}."""
    if augment is None:
        augment = dataset.split == "train"
    epoch = 0
    order_rng = np.random.default_rng(seed)
    while epochs is None or epoch < epochs:
        idx = np.arange(len(dataset))
        order_rng.shuffle(idx)
        idx = idx[process_index::process_count]
        aug_rng = np.random.default_rng(seed * 7919 + epoch)
        for start in range(0, len(idx) - batch_size + 1, batch_size):
            b0, bg, b1, bt = [], [], [], []
            for i in idx[start : start + batch_size]:
                img0, gt, img1, t = dataset.load(int(i))
                if augment:
                    img0, gt, img1, t = _augment(img0, gt, img1, t, aug_rng, crop)
                b0.append(np.ascontiguousarray(img0))
                bg.append(np.ascontiguousarray(gt))
                b1.append(np.ascontiguousarray(img1))
                bt.append(t)
            # Whole-batch u8 -> [0,1] through the native frameops library
            # (threaded C++, numpy fallback) — the host-side cost on the
            # training input path.
            from rife_tpu.native import u8_to_f32

            yield {
                "img0": u8_to_f32(np.stack(b0)),
                "img1": u8_to_f32(np.stack(b1)),
                "gt": u8_to_f32(np.stack(bg)),
                "timestep": np.asarray(bt, np.float32),
            }
        epoch += 1
