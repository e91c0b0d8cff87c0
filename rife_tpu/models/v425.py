"""RIFE v4.25 ("HDv3") preset — the Practical-RIFE network the fork ships.

Reference: train_log/IFNet_HDv3.py:24-169 and train_log/RIFE_HDv3.py:15-89.
Differences from the paper IFNet:

- A `Head` feature encoder (3 convs + ConvTranspose -> 4ch features);
  each block additionally sees the flow-warped encoder features.
- 5 IFBlocks (c = 192/128/96/64/32) over scale_list [16,8,4,2,1]/scale.
- convblock is 8 ResConvs with a learnable per-channel beta scale;
  LeakyReLU(0.2) activations throughout.
- lastconv = ConvTranspose(c -> 4*13) + PixelShuffle(2) producing 13
  channels: 4 flow + 1 mask + 8 feature channels carried between levels.
- An always-on timestep plane (tensor or scalar), mask is *replaced*
  (not accumulated) per level, and there is no contextnet/unet in
  fastmode — merged[-1] is the sigmoid-mask blend of the two warps.

The reference's training update for this preset cannot execute
(undefined `loss_cons`, train_log/RIFE_HDv3.py:62-88; and the forward
binds img0 only when training==False, train_log/IFNet_HDv3.py:119-128).
Here the evident intent is implemented
instead: `rife_tpu.cli.train --model v4.25` trains the teacherless
L1 + 0.1*SOBEL(flow) objective (train/loop.py, docs/TRAINING.md).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from rife_tpu.nn import (
    conv2d,
    conv_transpose2d,
    init_conv,
    init_conv_transpose,
    leaky_relu,
    pixel_shuffle,
)
from rife_tpu.ops import (from_planes, plane_down_int, plane_up, scale_by,
                          to_planes, warp2_blend_planes, warp2_planes)


@dataclass(frozen=True)
class V425Config:
    block_channels: tuple = (192, 128, 96, 64, 32)
    # Opt-in serving approximation (same engine knob as the paper
    # model's fast_level0): warp each block's inputs at the resolution
    # the block actually consumes (1/s) instead of warping full-res and
    # downsampling the stack.  v4.25 is warp-bound (18 full-res warps =
    # 43.2 of 78.7 ms/iter, tools/r3_exp34_v425trace.py), so this is
    # where its time goes.  Inference-only; merged[:-1] are None.
    fast_level0: bool = False

    @property
    def block_in(self) -> tuple:
        # block0: img0+img1 (6) + f0+f1 (8) + timestep (1)
        # later:  warped imgs (6) + warped feats (8) + t (1) + mask (1) + feat (8) [+4 flow]
        return (7 + 8, 8 + 4 + 8 + 8, 8 + 4 + 8 + 8, 8 + 4 + 8 + 8, 8 + 4 + 8 + 8)


def _conv_lrelu(x, p, stride=1):
    return leaky_relu(conv2d(x, p, stride=stride), 0.2)


def init_head(key) -> dict:
    ks = jax.random.split(key, 4)
    return {
        "cnn0": init_conv(ks[0], 3, 3, 3, 16),
        "cnn1": init_conv(ks[1], 3, 3, 16, 16),
        "cnn2": init_conv(ks[2], 3, 3, 16, 16),
        "cnn3": init_conv_transpose(ks[3], 4, 16, 4),
    }


def head_apply(p, x):
    """Feature encoder (train_log/IFNet_HDv3.py:24-43); returns 4ch features."""
    x0 = conv2d(x, p["cnn0"], stride=2)
    x = leaky_relu(x0, 0.2)
    x1 = conv2d(x, p["cnn1"])
    x = leaky_relu(x1, 0.2)
    x2 = conv2d(x, p["cnn2"])
    x = leaky_relu(x2, 0.2)
    return conv_transpose2d(x, p["cnn3"])


def init_resconv(key, c: int) -> dict:
    return {"conv": init_conv(key, 3, 3, c, c), "beta": jnp.ones((c,), jnp.float32)}


def resconv_apply(p, x):
    """x -> lrelu(conv(x) * beta + x) (train_log/IFNet_HDv3.py:45-54)."""
    return leaky_relu(conv2d(x, p["conv"]) * p["beta"].astype(x.dtype) + x, 0.2)


def init_v425_block(key, cin: int, c: int) -> dict:
    ks = jax.random.split(key, 11)
    return {
        "conv0": [init_conv(ks[0], 3, 3, cin, c // 2), init_conv(ks[1], 3, 3, c // 2, c)],
        "convblock": [init_resconv(ks[2 + i], c) for i in range(8)],
        "lastconv": init_conv_transpose(ks[10], 4, c, 4 * 13),
    }


def v425_block_core(p, x):
    """The conv stack of one v4.25 IFBlock: 2-stride-2 stem, 8 ResConvs,
    lastconv deconv + PixelShuffle -> 13ch at the input resolution.
    (A fused shuffle-to-planes transpose was measured 5.2 ms/iter
    WORSE full-graph than pixel_shuffle + to_planes — tools/r3_exp48,
    the usual relayout-poisoning failure mode.)"""
    x = _conv_lrelu(x, p["conv0"][0], stride=2)
    x = _conv_lrelu(x, p["conv0"][1], stride=2)
    for rp in p["convblock"]:
        x = resconv_apply(rp, x)
    tmp = conv_transpose2d(x, p["lastconv"])
    return pixel_shuffle(tmp, 2)


# The plane-major loop hands each block the warp outputs in PACKED
# channel order ([w_img0|wf0, w_img1|wf1, ...] straight from the 7ch
# pair warp) and absorbs the reorder into the stem weights instead of
# paying a channel-shuffling concat on full-res activations (~1.4
# ms/iter of slow concatenate ops traced in tools/r3_exp45_v425trace2.py).
# Packed j -> reference cin: [w0(0:3), wf0(3:7), w1(7:10), wf1(10:14)]
# maps to the reference order [w0(0:3), w1(3:6), wf0(6:10), wf1(10:14)].
_PACK_PERM = tuple([0, 1, 2, 6, 7, 8, 9, 3, 4, 5, 10, 11, 12, 13])


def _perm_stem(p, cin):
    w = p["conv0"][0]["w"]
    perm = list(_PACK_PERM) + list(range(14, cin))
    return {**p, "conv0": [{**p["conv0"][0], "w": w[:, :, perm, :]},
                           p["conv0"][1]]}


def v425_block_apply(p, x, flow, scale: float):
    """v4.25 IFBlock (train_log/IFNet_HDv3.py:56-90), NHWC in/out.

    Returns (flow[4], mask[1], feat[8]) at input resolution.  (The
    plane-major loop in v425_apply scales in plane layout and calls
    v425_block_core directly; this wrapper serves standalone use.)"""
    if scale != 1:
        x = scale_by(x, 1.0 / scale)
    if flow is not None:
        flow = scale_by(flow, 1.0 / scale) * (1.0 / scale)
        x = jnp.concatenate([x, flow], -1)
    tmp = v425_block_core(p, x)
    if scale != 1:
        tmp = scale_by(tmp, scale)
    flow_out = tmp[..., :4] * scale
    mask = tmp[..., 4:5]
    feat = tmp[..., 5:]
    return flow_out, mask, feat


def init_v425(key, cfg: V425Config = V425Config()) -> dict:
    ks = jax.random.split(key, 6)
    params = {
        f"block{i}": init_v425_block(ks[i], cin, c)
        for i, (cin, c) in enumerate(zip(cfg.block_in, cfg.block_channels))
    }
    params["encode"] = init_head(ks[5])
    return params


def v425_apply(params, img0, img1, *, timestep=0.5,
               scale_list=(16.0, 8.0, 4.0, 2.0, 1.0),
               cfg: V425Config = V425Config()):
    """v4.25 forward (train_log/IFNet_HDv3.py:119-169, fastmode inference).

    Returns dict(flow_list, mask, merged) — merged[-1] is the output frame.
    """
    # Plane-major loop (same design as models/ifnet.py): every
    # full-resolution small-C tensor (images, features, flow, mask,
    # carried feat, timestep) lives in the dense (N, C, H, W) plane
    # layout; NHWC exists only where each block's conv stack consumes,
    # at working resolution, via one relayout of the full concat.  The
    # per-level scale_by halvings become exact plane_down_int /
    # plane_up (all v4.25 scale factors are even integers).
    cat = jnp.concatenate
    n, h, w, _ = img0.shape
    t_pl = jnp.broadcast_to(
        jnp.asarray(timestep, img0.dtype).reshape((-1, 1, 1, 1)), (n, 1, h, w)
    ).astype(img0.dtype)

    img0_pl = to_planes(img0)
    img1_pl = to_planes(img1)
    # one batch-paired encoder pass: each head conv runs once at 2N
    f_pair = to_planes(head_apply(params["encode"],
                                  cat([img0, img1], 0)))
    f0_pl, f1_pl = f_pair[:n], f_pair[n:]
    fast = cfg.fast_level0

    flow_pl = None
    mask_pl = None
    feat_pl = None
    w0_pl = w1_pl = wf0_pl = wf1_pl = None
    flow_list, mask_list, merged = [], [], []
    nlev = len(cfg.block_channels)
    for i in range(nlev):
        p = params[f"block{i}"]
        s = int(scale_list[i])
        assert s == scale_list[i] and (s == 1 or s % 2 == 0), scale_list
        if flow_pl is None:
            stack_pl = cat([img0_pl, img1_pl, f0_pl, f1_pl, t_pl], 1)
            xcat = from_planes(plane_down_int(stack_pl, s))
        elif fast and s != 1:
            # Warp at the block's working resolution: downsample the
            # warp INPUTS (images, encoder features, flow) and run ONE
            # packed 7ch warp pair at 1/s instead of two full-res
            # pairs.  Approximate (warp∘down != down∘warp), like the
            # paper model's fast0.
            fl_pl = plane_down_int(flow_pl, s) * (1.0 / s)
            srcs_s = plane_down_int(
                cat([img0_pl, f0_pl, img1_pl, f1_pl], 1), s)
            ws0, ws1 = warp2_planes(
                srcs_s[:, 0:7], srcs_s[:, 7:14],
                fl_pl[:, 0:2], fl_pl[:, 2:4])
            rest_s = plane_down_int(cat([t_pl, mask_pl, feat_pl], 1), s)
            p = _perm_stem(p, cfg.block_in[i])  # packed channel order
            xcat = from_planes(cat(
                [ws0, ws1, rest_s, fl_pl.astype(srcs_s.dtype)], 1))
        else:
            # wp0/wp1 are the previous level's packed 7ch warps
            # ([w_img|wf] per side); the stem weights absorb the
            # channel reorder (_perm_stem)
            stack_pl = cat([wp0_pl, wp1_pl, t_pl, mask_pl, feat_pl], 1)
            fl_pl = plane_down_int(flow_pl, s) * (1.0 / s)
            p = _perm_stem(p, cfg.block_in[i])
            xcat = from_planes(cat([plane_down_int(stack_pl, s),
                                    fl_pl.astype(stack_pl.dtype)], 1))
        tmp_pl = to_planes(v425_block_core(p, xcat))
        if s != 1:
            tmp_pl = plane_up(tmp_pl, s)
        fd_pl = tmp_pl[:, :4] * s
        mask_pl = tmp_pl[:, 4:5]
        feat_pl = tmp_pl[:, 5:]
        flow_pl = fd_pl if flow_pl is None else flow_pl + fd_pl
        mask_list.append(mask_pl)
        flow_list.append(from_planes(flow_pl))
        last = i + 1 == nlev
        if not last and (not fast or int(scale_list[i + 1]) == 1):
            # The next level consumes full-res warps of BOTH the images
            # and the encoder features, by this same flow: one packed
            # 7ch pair call (bit-exact vs two separate pairs — the
            # kernel is channel-independent) instead of an image pair
            # here plus a feature pair there.  Shares one scalar prep
            # and amortizes the per-subtile coordinate work (images
            # alone pay ~2.2x per subtile-channel at cb=3,
            # docs/PERFORMANCE.md).
            wp0_pl, wp1_pl = warp2_planes(
                cat([img0_pl, f0_pl], 1), cat([img1_pl, f1_pl], 1),
                flow_pl[:, 0:2], flow_pl[:, 2:4])
            w0_pl, w1_pl = wp0_pl[:, 0:3], wp1_pl[:, 0:3]
            merged.append((from_planes(w0_pl), from_planes(w1_pl)))
        elif last:
            # Final level: pair warp fused with the sigmoid-mask blend
            # (train_log/IFNet_HDv3.py:163-168) — nothing downstream
            # consumes w0/w1 separately (no refine stage in fastmode),
            # so the fused kernel emits ONLY the blended frame.
            blend_pl = warp2_blend_planes(img0_pl, img1_pl, flow_pl,
                                          mask_pl, need_pair=False)
            merged.append(None)  # replaced with the blend below
        else:
            # fast mode: this level's warps are consumed only by the
            # next block, at 1/s_{i+1} — warped there instead
            merged.append(None)

    merged[-1] = from_planes(blend_pl)
    return {"flow_list": flow_list, "mask": from_planes(mask_list[-1]),
            "merged": merged}
