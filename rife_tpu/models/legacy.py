"""Legacy RIFE v2 ("HDv2") model — checkpoint compatibility.

Reference: model/oldmodel/IFNet_HDv2.py:24-95 and
model/oldmodel/RIFE_HDv2.py:37-199.  v2 predates the unified student/
teacher design: three separately-checkpointed nets (flownet.pkl /
contextnet.pkl / unet.pkl) composed at inference:

- IFNet: 4 IFBlocks at fixed scales 8/4/2/1 (c = 192/128/96/48 with a
  2c expansion inside); each block emits a 4-ch bidirectional flow
  *residual* at HALF the input resolution; flows are 2x-upsampled (and
  doubled) to warp the full-res images for the next block.
- ContextNet: 5 Conv2 stages (c=32) producing a 4-level warped feature
  pyramid from 1/4 down to 1/32 resolution.
- FusionNet: U-Net over (warped0, warped1, flow) + both context
  pyramids; final ConvTranspose gives 4 channels: 3 residual (sigmoid*2
  - 1) + 1 blend mask; pred = clamp(w0*mask + w1*(1-mask) + res, 0, 1)
  (RIFE_HDv2.py:176-193).

This module also carries the even older v1 ("HD", reference
model/oldmodel/IFNet_HD.py:27-113 + RIFE_HD.py:129-250): SE-style
squeeze-excite ResBlocks, PixelShuffle flow heads, a UNIDIRECTIONAL
2-channel flow (img1 warped with -F), the flownet operating on
0.5x-downsampled input, and a ContextNet/FusionNet pair with its own
SE ResBlocks.  v1 is an inference-only checkpoint-compat preset — its
BatchNorm layers (IFNet_HD only; bias-free convs + BN) are FOLDED into
the conv weights at import time (eval-mode BN is an affine map), which
is both exact and faster on TPU than a separate normalization op.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from rife_tpu.nn import (
    conv2d,
    conv_prelu,
    conv_prelu_params,
    conv_transpose2d,
    deconv_prelu_params,
    init_conv,
    init_conv_transpose,
    init_prelu,
    pixel_shuffle,
    prelu,
)
from rife_tpu.ops import scale_by, warp, warp2


@dataclass(frozen=True)
class HDv2Config:
    block_channels: tuple = (192, 128, 96, 48)
    block_scales: tuple = (8.0, 4.0, 2.0, 1.0)
    block_in: tuple = (6, 10, 10, 10)
    ctx_c: int = 32


def _init_hdv2_block(key, cin: int, c: int) -> dict:
    ks = jax.random.split(key, 9)
    return {
        "conv0": [
            conv_prelu_params(ks[0], 3, 3, cin, c),
            conv_prelu_params(ks[1], 3, 3, c, 2 * c),
        ],
        "convblock": [conv_prelu_params(ks[2 + i], 3, 3, 2 * c, 2 * c) for i in range(6)],
        "conv1": init_conv_transpose(ks[8], 4, 2 * c, 4),
    }


def _hdv2_block_apply(p, x, scale: float):
    """IFBlock (IFNet_HDv2.py:24-53): returns 4ch flow at x's half res."""
    if scale != 1:
        x = scale_by(x, 1.0 / scale)
    x = conv_prelu(x, p["conv0"][0], stride=2)
    x = conv_prelu(x, p["conv0"][1], stride=2)
    for cp in p["convblock"]:
        x = conv_prelu(x, cp)
    flow = conv_transpose2d(x, p["conv1"])
    if scale != 1:
        flow = scale_by(flow, scale)
    return flow


def init_hdv2(key, cfg: HDv2Config = HDv2Config()) -> dict:
    ks = jax.random.split(key, 16)
    c = cfg.ctx_c
    params = {
        f"block{i}": _init_hdv2_block(ks[i], cin, ch)
        for i, (cin, ch) in enumerate(zip(cfg.block_in, cfg.block_channels))
    }
    ctx = {}
    widths = [(3, c), (c, c), (c, 2 * c), (2 * c, 4 * c), (4 * c, 8 * c)]
    for i, (ci, co) in enumerate(widths):
        k1, k2 = jax.random.split(ks[4 + i])
        ctx[f"conv{i}"] = {
            "conv1": conv_prelu_params(k1, 3, 3, ci, co),
            "conv2": conv_prelu_params(k2, 3, 3, co, co),
        }
    params["contextnet"] = ctx
    fus = {}
    fw = [("conv0", 10, c), ("down0", c, 2 * c), ("down1", 4 * c, 4 * c),
          ("down2", 8 * c, 8 * c), ("down3", 16 * c, 16 * c)]
    for i, (name, ci, co) in enumerate(fw):
        k1, k2 = jax.random.split(ks[9 + i])
        fus[name] = {
            "conv1": conv_prelu_params(k1, 3, 3, ci, co),
            "conv2": conv_prelu_params(k2, 3, 3, co, co),
        }
    fus["up0"] = deconv_prelu_params(ks[14], 4, 32 * c, 8 * c)
    kk = jax.random.split(ks[15], 4)
    fus["up1"] = deconv_prelu_params(kk[0], 4, 16 * c, 4 * c)
    fus["up2"] = deconv_prelu_params(kk[1], 4, 8 * c, 2 * c)
    fus["up3"] = deconv_prelu_params(kk[2], 4, 4 * c, c)
    fus["conv"] = init_conv_transpose(kk[3], 4, c, 4)
    params["fusionnet"] = fus
    return params


def _conv2_apply(p, x, stride=2):
    x = conv_prelu(x, p["conv1"], stride=stride)
    return conv_prelu(x, p["conv2"], stride=1)


def _hdv2_context(p, img, flow_half):
    """ContextNet (RIFE_HDv2.py:50-77): two stride-2 stages before the
    first warp; flow_half is the half-res flow from IFNet."""
    x = _conv2_apply(p["conv0"], img)
    x = _conv2_apply(p["conv1"], x)
    feats = []
    flow = flow_half
    for name in ("conv2", "conv3", "conv4", None):
        flow = scale_by(flow, 0.5) * 0.5
        feats.append(warp(x, flow))
        if name is not None:
            x = _conv2_apply(p[name], x)
    # loop order: warp happens after each downsample of flow, before the
    # next conv stage; feats collected at 1/4, 1/8, 1/16, 1/32.
    return feats


def hdv2_apply(params, img0, img1, *, timestep=0.5, scale_list=(1.0,),
               cfg: HDv2Config = HDv2Config()):
    """Full v2 inference (RIFE_HDv2.py:176-199).

    scale_list[0] is the divisor d; the flownet runs on inputs resized
    by 1/d (reference `scale = 1/d` passed to IFNet.forward).
    """
    cat = jnp.concatenate
    d = scale_list[0]
    x = cat([img0, img1], -1)
    xs = scale_by(x, 1.0 / d) if d != 1 else x

    # --- IFNet (IFNet_HDv2.py:56-86): accumulate half-res flow.
    # flow_list keeps each block's accumulated flow (the reference's
    # IFNet returns it for the EPE consistency term of the training
    # objective, RIFE_HDv2.py:210-227); [-1] is the final flow.
    flow = _hdv2_block_apply(params["block0"], xs, cfg.block_scales[0])
    flow_list = [flow]
    for i in (1, 2, 3):
        f_large = scale_by(flow, 2.0) * 2.0
        w0, w1 = warp2(xs[..., :3], xs[..., 3:], f_large[..., 0:2], f_large[..., 2:4])
        res = _hdv2_block_apply(
            params[f"block{i}"], cat([w0, w1, f_large], -1), cfg.block_scales[i]
        )
        flow = flow + res
        flow_list.append(flow)
    if d != 1:
        flow = scale_by(flow, d) * d
        flow_list = [scale_by(f, d) * d for f in flow_list]

    # --- predict (RIFE_HDv2.py:176-193)
    c0 = _hdv2_context(params["contextnet"], img0, flow[..., 0:2])
    c1 = _hdv2_context(params["contextnet"], img1, flow[..., 2:4])
    flow_full = scale_by(flow, 2.0) * 2.0
    warped0, warped1 = warp2(img0, img1, flow_full[..., 0:2], flow_full[..., 2:4])

    p = params["fusionnet"]
    s = _conv2_apply(p["conv0"], cat([warped0, warped1, flow_full], -1))
    s0 = _conv2_apply(p["down0"], s)
    s1 = _conv2_apply(p["down1"], cat([s0, c0[0], c1[0]], -1))
    s2 = _conv2_apply(p["down2"], cat([s1, c0[1], c1[1]], -1))
    s3 = _conv2_apply(p["down3"], cat([s2, c0[2], c1[2]], -1))
    u = conv_transpose2d(cat([s3, c0[3], c1[3]], -1), p["up0"]["conv"])
    u = prelu(u, p["up0"]["alpha"])
    u = conv_transpose2d(cat([u, s2], -1), p["up1"]["conv"])
    u = prelu(u, p["up1"]["alpha"])
    u = conv_transpose2d(cat([u, s1], -1), p["up2"]["conv"])
    u = prelu(u, p["up2"]["alpha"])
    u = conv_transpose2d(cat([u, s0], -1), p["up3"]["conv"])
    u = prelu(u, p["up3"]["alpha"])
    refine = conv_transpose2d(u, p["conv"])

    res = jax.nn.sigmoid(refine[..., :3]) * 2 - 1
    mask = jax.nn.sigmoid(refine[..., 3:4])
    merged = warped0 * mask + warped1 * (1 - mask)
    pred = jnp.clip(merged + res, 0.0, 1.0)
    return {"flow_list": flow_list, "mask": mask, "merged": [merged, pred]}


# --------------------------------------------------------------------------
# RIFE v1 ("HD") — the oldest legacy preset.
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class HDConfig:
    block_channels: tuple = (192, 128, 96, 48)
    block_scales: tuple = (8.0, 4.0, 2.0, 1.0)
    block_in: tuple = (6, 8, 8, 8)  # later blocks see (w0, w1, flow2ch)
    ctx_c: int = 32


def _se_resblock(p, x, stride: int = 1):
    """Squeeze-excite ResBlock (IFNet_HD.py:27-49 / RIFE_HD.py:37-61):
    global-mean channel gate fc1 -> PReLU(1) -> fc2 -> sigmoid, applied
    to the conv branch before the residual add.  `conv0` is absent when
    the torch side is nn.Identity (same width, stride 1)."""
    y = conv2d(x, p["conv0"], stride=stride) if "conv0" in p else x
    h = conv_prelu(x, p["conv1"], stride=stride)
    h = conv2d(h, p["conv2"])
    w = jnp.mean(h, axis=(1, 2), keepdims=True)
    w = prelu(conv2d(w, p["fc1"], padding=0), p["relu1"])
    w = jax.nn.sigmoid(conv2d(w, p["fc2"], padding=0))
    return prelu(h * w + y, p["relu2"])


def _init_se_resblock(key, cin: int, cout: int, k1: int, stride: int) -> dict:
    ks = jax.random.split(key, 4)
    p = {
        "conv1": conv_prelu_params(ks[0], k1, k1, cin, cout),
        "conv2": init_conv(ks[1], 3, 3, cout, cout),
        "relu1": init_prelu(1),
        "relu2": init_prelu(cout),
        "fc1": {"w": init_conv(ks[2], 1, 1, cout, 16)["w"]},
        "fc2": {"w": init_conv(ks[3], 1, 1, 16, cout)["w"]},
    }
    if not (cin == cout and stride == 1):
        kk = jax.random.split(ks[1])[0]
        p["conv0"] = {"w": init_conv(kk, 3, 3, cin, cout)["w"]}
    return p


def _init_hd_block(key, cin: int, c: int) -> dict:
    ks = jax.random.split(key, 8)
    p = {
        "conv0": conv_prelu_params(ks[0], 5, 5, cin, c),
        "conv1": init_conv(ks[7], 3, 3, c, 8),
    }
    for i in range(6):
        p[f"res{i}"] = _init_se_resblock(ks[1 + i], c, c, 5, 1)
    return p


def init_hd(key, cfg: HDConfig = HDConfig()) -> dict:
    ks = jax.random.split(key, 16)
    c = cfg.ctx_c
    params = {
        f"block{i}": _init_hd_block(ks[i], cin, ch)
        for i, (cin, ch) in enumerate(zip(cfg.block_in, cfg.block_channels))
    }
    ctx = {"conv0": conv_prelu_params(ks[4], 3, 3, 3, c)}
    for i, (ci, co) in enumerate([(c, c), (c, 2 * c), (2 * c, 4 * c), (4 * c, 8 * c)]):
        ctx[f"conv{i + 1}"] = _init_se_resblock(ks[5 + i], ci, co, 3, 2)
    params["contextnet"] = ctx
    fus = {"conv0": conv_prelu_params(ks[9], 3, 3, 8, c)}
    for i, (ci, co) in enumerate([(c, 2 * c), (4 * c, 4 * c), (8 * c, 8 * c),
                                  (16 * c, 16 * c)]):
        fus[f"down{i}"] = _init_se_resblock(ks[10 + i], ci, co, 3, 2)
    kk = jax.random.split(ks[14], 5)
    fus["up0"] = deconv_prelu_params(kk[0], 4, 32 * c, 8 * c)
    fus["up1"] = deconv_prelu_params(kk[1], 4, 16 * c, 4 * c)
    fus["up2"] = deconv_prelu_params(kk[2], 4, 8 * c, 2 * c)
    fus["up3"] = deconv_prelu_params(kk[3], 4, 4 * c, c)
    fus["conv"] = init_conv(kk[4], 3, 3, c, 16)
    params["fusionnet"] = fus
    return params


def _hd_block_apply(p, x, scale: float):
    """IFBlock (IFNet_HD.py:53-81): 5x5/s2 stem, 6 SE ResBlocks,
    3x3 -> 8ch -> PixelShuffle(2) -> 2ch unidirectional flow at x's
    resolution (NOT magnitude-rescaled across the internal resize —
    reference interpolates the flow without multiplying)."""
    if scale != 1:
        x = scale_by(x, 1.0 / scale)
    x = conv_prelu(x, p["conv0"], stride=2)
    for i in range(6):
        x = _se_resblock(p[f"res{i}"], x)
    flow = pixel_shuffle(conv2d(x, p["conv1"]), 2)
    if scale != 1:
        flow = scale_by(flow, scale)
    return flow


def _hd_context(p, img, flow):
    """ContextNet (RIFE_HD.py:65-91): img at full res, flow at 1/2 res;
    warped feature pyramid at 1/4, 1/8, 1/16, 1/32."""
    x = conv_prelu(img, p["conv0"], stride=2)
    feats = []
    for i in (1, 2, 3, 4):
        x = _se_resblock(p[f"conv{i}"], x, stride=2)
        flow = scale_by(flow, 0.5) * 0.5
        feats.append(warp(x, flow))
    return feats


def hd_apply(params, img0, img1, *, timestep=0.5, scale_list=(1.0,),
             cfg: HDConfig = HDConfig()):
    """Full v1 inference (RIFE_HD.py:192-214).

    scale_list[0] is the divisor d (engine convention); the reference's
    `scale` knob is 1/d — the flownet downsamples input by 0.5*scale and
    rescales its output flow by 1/scale (IFNet_HD.py:95,110-112)."""
    cat = jnp.concatenate
    s = 1.0 / scale_list[0]

    # --- flownet on 0.5*scale input; flow accumulates across 4 blocks.
    x = scale_by(cat([img0, img1], -1), 0.5 * s)
    flow = _hd_block_apply(params["block0"], x, cfg.block_scales[0])
    # per-block accumulated flows for the training EPE term (the v1
    # update consumes flownet's flow_list, RIFE_HD.py:222-239; note v1
    # flow is UNIdirectional 2ch: +F warps img0, -F warps img1)
    flow_list = [flow]
    for i in (1, 2, 3):
        w0 = warp(x[..., :3], flow)
        w1 = warp(x[..., 3:], -flow)
        res = _hd_block_apply(params[f"block{i}"], cat([w0, w1, flow], -1),
                              cfg.block_scales[i])
        flow = flow + res
        flow_list.append(flow)
    if s != 1:
        flow = scale_by(flow, 1.0 / s) / s
        flow_list = [scale_by(f, 1.0 / s) / s for f in flow_list]
    # flow is now at 1/2 the input resolution.

    # --- predict (RIFE_HD.py:192-210)
    c0 = _hd_context(params["contextnet"], img0, flow)
    c1 = _hd_context(params["contextnet"], img1, -flow)
    flow_full = scale_by(flow, 2.0) * 2.0
    warped0 = warp(img0, flow_full)
    warped1 = warp(img1, -flow_full)

    p = params["fusionnet"]
    h = conv_prelu(cat([warped0, warped1, flow_full], -1), p["conv0"], stride=2)
    s0 = _se_resblock(p["down0"], h, stride=2)
    s1 = _se_resblock(p["down1"], cat([s0, c0[0], c1[0]], -1), stride=2)
    s2 = _se_resblock(p["down2"], cat([s1, c0[1], c1[1]], -1), stride=2)
    s3 = _se_resblock(p["down3"], cat([s2, c0[2], c1[2]], -1), stride=2)
    u = prelu(conv_transpose2d(cat([s3, c0[3], c1[3]], -1), p["up0"]["conv"]),
              p["up0"]["alpha"])
    u = prelu(conv_transpose2d(cat([u, s2], -1), p["up1"]["conv"]), p["up1"]["alpha"])
    u = prelu(conv_transpose2d(cat([u, s1], -1), p["up2"]["conv"]), p["up2"]["alpha"])
    u = prelu(conv_transpose2d(cat([u, s0], -1), p["up3"]["conv"]), p["up3"]["alpha"])
    refine = pixel_shuffle(conv2d(u, p["conv"]), 2)

    res = jax.nn.sigmoid(refine[..., :3]) * 2 - 1
    mask = jax.nn.sigmoid(refine[..., 3:4])
    merged = warped0 * mask + warped1 * (1 - mask)
    pred = jnp.clip(merged + res, 0.0, 1.0)
    return {"flow_list": flow_list, "mask": mask, "merged": [merged, pred]}
