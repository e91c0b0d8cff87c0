"""Host-side scene-gate probe.

The reference gates every frame pair on ssim_matlab over 32x32 bilinear
downsamples of the padded model inputs (inference_video.py:226-228).
Computing that on-device forces a blocking scalar fetch per pair before
the gap can even be queued — at the 120 fps/chip budget one synchronous
round-trip per pair is material, and on tunneled runtimes it serializes
the whole pipeline.  The probe math is tiny (32x32x3), so it runs here
in numpy: pad the uint8 frame exactly like the device prep graph, resize
in float (cv2 INTER_LINEAR shares torch F.interpolate's align_corners=
False half-pixel convention), and evaluate the same volumetric SSIM the
jax ops.ssim_matlab computes — a numpy transcription of the identical
separable 11-tap formula (ops/ssim.py:57-118).

The static-replacement branch still probes on device (the candidate
frame only exists there, and static hits are rare).
"""
from __future__ import annotations

import numpy as np

from rife_tpu.ops.ssim import _gaussian_1d


def probe_small(frame: np.ndarray, pad_widths) -> np.ndarray:
    """(H, W, 3) uint8/float frame -> padded -> (32, 32, 3) float32 in [0,1]."""
    import cv2

    x = frame.astype(np.float32)
    if frame.dtype == np.uint8:
        x /= 255.0
    top, bottom, left, right = pad_widths
    if top or bottom or left or right:
        x = np.pad(x, ((top, bottom), (left, right), (0, 0)))
    return cv2.resize(x, (32, 32), interpolation=cv2.INTER_LINEAR)


def _np_blur(x: np.ndarray, axes, window_size: int, pad: int = 5) -> np.ndarray:
    taps = _gaussian_1d(window_size)
    for ax in axes:
        widths = [(pad, pad) if i == ax else (0, 0) for i in range(x.ndim)]
        x = np.pad(x, widths, mode="edge")
        k = len(taps)
        out_len = x.shape[ax] - k + 1
        acc = None
        for i, t in enumerate(taps):
            sl = [slice(None)] * x.ndim
            sl[ax] = slice(i, i + out_len)
            term = x[tuple(sl)] * np.float32(t)
            acc = term if acc is None else acc + term
        x = acc
    return x


def ssim_probe(small0: np.ndarray, small1: np.ndarray) -> float:
    """Volumetric SSIM of two (32, 32, 3) float01 probes, L=1 — the numpy
    twin of ops.ssim_matlab (same window, padding quirk and all)."""
    v1 = np.moveaxis(small0, -1, 0)[None]  # (1, D=3, 32, 32)
    v2 = np.moveaxis(small1, -1, 0)[None]
    real = min(11, 32, 32)
    blur = lambda x: _np_blur(x, (1, 2, 3), real)
    mu1, mu2 = blur(v1), blur(v2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = blur(v1 * v1) - mu1_sq
    sigma2_sq = blur(v2 * v2) - mu2_sq
    sigma12 = blur(v1 * v2) - mu1_mu2
    c1 = 0.01**2
    c2 = 0.03**2
    v_1 = 2.0 * sigma12 + c2
    v_2 = sigma1_sq + sigma2_sq + c2
    ssim_map = ((2 * mu1_mu2 + c1) * v_1) / ((mu1_sq + mu2_sq + c1) * v_2)
    return float(np.mean(ssim_map))
