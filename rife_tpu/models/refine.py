"""Context pyramid + U-Net fusion (the refinement stage).

Reference: model/refine.py:36-82 (paper nets) and model/refine_2R.py:25-83
(half-resolution "2R" variant).  Contextnet extracts a 4-level feature
pyramid from a source image and warps each level by the (progressively
halved and rescaled) flow; Unet fuses images, warps, mask, flow and both
context pyramids through a 4-down/4-up encoder-decoder into a sigmoid
residual image.

The whole stage is pure function of (params, tensors) and is jitted as
part of the full forward graph — XLA fuses the concats into the convs.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from rife_tpu.nn import (conv_prelu, conv_prelu_planes, conv_transpose2d,
                         conv2d, prelu, conv_prelu_params,
                         deconv_prelu_params, init_conv)
from rife_tpu.ops import from_planes, plane_down2, to_planes, warp_planes

_C = 16  # base channel width (reference refine.py:35)


def _conv2_params(key, cin, cout):
    k1, k2 = jax.random.split(key)
    return {
        "conv1": conv_prelu_params(k1, 3, 3, cin, cout),
        "conv2": conv_prelu_params(k2, 3, 3, cout, cout),
    }


def _conv2_apply(p, x, stride=2, planes=False):
    if planes:
        x = conv_prelu_planes(x, p["conv1"], stride=stride)
    else:
        x = conv_prelu(x, p["conv1"], stride=stride)
    return conv_prelu(x, p["conv2"], stride=1)


def init_contextnet(key) -> dict:
    ks = jax.random.split(key, 4)
    return {
        "conv1": _conv2_params(ks[0], 3, _C),
        "conv2": _conv2_params(ks[1], _C, 2 * _C),
        "conv3": _conv2_params(ks[2], 2 * _C, 4 * _C),
        "conv4": _conv2_params(ks[3], 4 * _C, 8 * _C),
    }


def contextnet_apply(p, img, flow_pl, half_res: bool = False,
                     planes: bool = False) -> list[jnp.ndarray]:
    """4-level warped feature pyramid (refine.py:44-57 / refine_2R.py:44-58).

    flow_pl is in the (N, 2, H, W) plane layout: the per-level flow
    halvings and the warp scalar prep then run on dense (H, W)-tiled
    data instead of the 2-lane-sparse NHWC layout (docs/PERFORMANCE.md
    'layout tax').  x0.5 bilinear == exact 2x2 mean, so plane_down2
    reproduces the reference's F.interpolate halving exactly.

    half_res: conv1 is stride-1 and the first warp uses the flow unscaled.
    planes: img is (N, 3, H, W) planes — conv1 consumes it directly.
    """
    feats = []
    x = _conv2_apply(p["conv1"], img, stride=1 if half_res else 2,
                     planes=planes)
    if not half_res:
        flow_pl = plane_down2(flow_pl) * 0.5
    feats.append(from_planes(warp_planes(to_planes(x), flow_pl)))
    for name in ("conv2", "conv3", "conv4"):
        x = _conv2_apply(p[name], x, stride=2)
        flow_pl = plane_down2(flow_pl) * 0.5
        feats.append(from_planes(warp_planes(to_planes(x), flow_pl)))
    return feats


def contextnet_apply_pair(p, img0, img1, flow0_pl, flow1_pl,
                          half_res: bool = False, planes: bool = False):
    """Both context pyramids in one batch-concatenated pass: every conv
    runs at 2N (better MXU utilization) and each level's two feature
    warps become one kernel launch.  Exactly equivalent to two
    contextnet_apply calls.  Flows arrive as (N, 2, H, W) planes;
    planes=True means img0/img1 do too."""
    n = img0.shape[0]
    img = jnp.concatenate([img0, img1], 0)
    flow_pl = jnp.concatenate([flow0_pl, flow1_pl], 0)
    feats = contextnet_apply(p, img, flow_pl, half_res, planes=planes)
    c0 = [f[:n] for f in feats]
    c1 = [f[n:] for f in feats]
    return c0, c1


def init_unet(key) -> dict:
    ks = jax.random.split(key, 9)
    return {
        "down0": _conv2_params(ks[0], 17, 2 * _C),
        "down1": _conv2_params(ks[1], 4 * _C, 4 * _C),
        "down2": _conv2_params(ks[2], 8 * _C, 8 * _C),
        "down3": _conv2_params(ks[3], 16 * _C, 16 * _C),
        "up0": deconv_prelu_params(ks[4], 4, 32 * _C, 8 * _C),
        "up1": deconv_prelu_params(ks[5], 4, 16 * _C, 4 * _C),
        "up2": deconv_prelu_params(ks[6], 4, 8 * _C, 2 * _C),
        "up3": deconv_prelu_params(ks[7], 4, 4 * _C, _C),
        "conv": init_conv(ks[8], 3, 3, _C, 3),
    }


def unet_apply(p, x17, c0, c1, half_res: bool = False,
               planes: bool = False) -> jnp.ndarray:
    """Fusion U-Net -> sigmoid 3ch residual (refine.py:72-82 / refine_2R.py:72-83).

    x17: the concat [img0, img1, warped0, warped1, mask, flow]
    (3+3+3+3+1+4 = 17 ch) — NHWC, or (N, 17, H, W) planes with
    planes=True, in which case down0's first conv does the ONE
    planes->NHWC relayout (layout tax, docs/PERFORMANCE.md)."""
    cat = jnp.concatenate
    s0 = _conv2_apply(p["down0"], x17, stride=1 if half_res else 2,
                      planes=planes)
    s1 = _conv2_apply(p["down1"], cat([s0, c0[0], c1[0]], -1))
    s2 = _conv2_apply(p["down2"], cat([s1, c0[1], c1[1]], -1))
    s3 = _conv2_apply(p["down3"], cat([s2, c0[2], c1[2]], -1))
    x = conv_transpose2d(cat([s3, c0[3], c1[3]], -1), p["up0"]["conv"])
    x = prelu(x, p["up0"]["alpha"])
    x = conv_transpose2d(cat([x, s2], -1), p["up1"]["conv"])
    x = prelu(x, p["up1"]["alpha"])
    x = conv_transpose2d(cat([x, s1], -1), p["up2"]["conv"])
    x = prelu(x, p["up2"]["alpha"])
    x = conv_transpose2d(cat([x, s0], -1), p["up3"]["conv"])
    x = prelu(x, p["up3"]["alpha"])
    x = conv2d(x, p["conv"], stride=2 if half_res else 1)
    return jax.nn.sigmoid(x)
