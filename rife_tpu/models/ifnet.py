"""Unified IFNet: coarse-to-fine intermediate flow estimation.

One implementation covers three reference networks (SURVEY.md §2.2):

- variant="rife":    paper IFNet     (reference model/IFNet.py:53-108)
- variant="rife_m":  arbitrary-timestep IFNet_m — a constant timestep
                     plane is concatenated into every block input
                     (reference model/IFNet_m.py:53-112)
- half_res=True:     the "2R" variant — IFBlock conv0's first conv is
                     stride-1 and outputs upsample by `scale` instead of
                     `scale*2` (reference model/IFNet_2R.py:20-51)

Design notes (TPU-first):
- The 3-level student loop is a static Python loop: three distinct
  weight shapes -> three fused conv stacks in one XLA graph.  The
  teacher/distillation branch is traced only when `gt` is passed, so
  train and infer are separate compiled graphs with no dynamic branching.
- Resolution invariance comes from the downsample/rescale contract of
  scale_by (exact align_corners=False semantics) — flow tensors are
  always in output-resolution pixel units.
- All tensors NHWC; flow is [..., (dx, dy, dx', dy')] with [0:2] = t->0,
  [2:4] = t->1.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp

from rife_tpu.nn import (conv_prelu, conv_prelu_planes, conv_transpose2d,
                         conv_prelu_params, init_conv_transpose)
from rife_tpu.models.refine import (
    contextnet_apply_pair,
    init_contextnet,
    init_unet,
    unet_apply,
)
from rife_tpu.ops import (from_planes, plane_down2, plane_down_int, plane_up,
                          scale_by, to_planes, warp2_blend_planes,
                          warp2_planes)


def _even_int(s) -> bool:
    return float(s) == int(s) and int(s) % 2 == 0


@dataclass(frozen=True)
class IFNetConfig:
    variant: str = "rife"  # "rife" | "rife_m"
    half_res: bool = False  # "2R" stride/upsample contract
    block_channels: tuple = (240, 150, 90)
    teacher_channels: int = 90
    refine: bool = True  # contextnet+unet residual stage
    # Fast serving mode (inference only, NOT exact): level-0's warps are
    # evaluated at the half resolution block1 actually consumes instead
    # of full res (the reference warps full-res images at every level,
    # model/IFNet.py:84-85, then immediately downsamples them inside the
    # next block).  Saves two full-res warps + a 17ch full-res resize.
    fast_level0: bool = False
    # Rung 2 of the qualified-approximation ladder (inference only, NOT
    # exact): evaluate the whole refinement stage (contextnet + fusion
    # U-Net + their 10 warps, reference model/refine.py:36-82) at half
    # resolution and bilinearly upsample the 3ch residual before the
    # clamp.  The refine stage is ~2/3 of the exact graph's full-res
    # conv+warp bill (docs/PERFORMANCE.md "TRUE budget"); the residual
    # it produces is low-amplitude (sigmoid*2-1 around 0), so its
    # high-frequency content is protocol-qualified away — see
    # tests/test_benchmarks_golden.py fast-rung qualification.
    fast_refine: bool = False

    @property
    def timestep_plane(self) -> bool:
        return self.variant == "rife_m"

    @property
    def block_in(self) -> tuple:
        t = 1 if self.timestep_plane else 0
        # block0 sees (img0, img1 [, t]); later blocks add 2 warps + mask + 4 flow.
        return (6 + t, 13 + t + 4, 13 + t + 4)

    @property
    def teacher_in(self) -> int:
        return 16 + (1 if self.timestep_plane else 0) + 4


def init_ifblock(key, cin: int, c: int) -> dict:
    ks = jax.random.split(key, 11)
    return {
        "conv0": [
            conv_prelu_params(ks[0], 3, 3, cin, c // 2),
            conv_prelu_params(ks[1], 3, 3, c // 2, c),
        ],
        "convblock": [conv_prelu_params(ks[2 + i], 3, 3, c, c) for i in range(8)],
        "lastconv": init_conv_transpose(ks[10], 4, c, 5),
    }


def ifblock_conv_core(p, x, half_res: bool = False, planes: bool = False):
    """The conv stack of one IFBlock: stem + 8 convblocks + lastconv
    deconv.  x is the working-resolution NHWC input (flow already
    concatenated) — or, with planes=True, the same input as (N, C, H, W)
    planes, relayouted once inside the stem (nn.conv_prelu_planes).
    Returns the raw 5ch `tmp` at half the working resolution (or the
    working resolution for half_res).

    (A phase-decomposed lastconv emitting planes directly was re-tried
    on the plane-glue graph and measured neutral-to-slower than
    deconv+to_planes at all three block shapes — tools/r3_exp10.py;
    the tiled k4s2 deconv plus a 5ch relayout is already cheap.)"""
    if planes:
        x = conv_prelu_planes(x, p["conv0"][0], stride=1 if half_res else 2)
    else:
        x = conv_prelu(x, p["conv0"][0], stride=1 if half_res else 2)
    x = conv_prelu(x, p["conv0"][1], stride=2)
    y = x
    for cp in p["convblock"]:
        y = conv_prelu(y, cp)
    return conv_transpose2d(y + x, p["lastconv"])


def ifblock_apply(p, x, flow, scale: float, half_res: bool = False,
                  prescaled: bool = False):
    """One IFBlock (reference model/IFNet.py:39-51), NHWC in/out.

    Returns (flow_residual[4ch], mask_logit[1ch]) at input resolution.
    prescaled: the caller already built x (and flow) at the working
    resolution — skip the input downsample but keep the output-upsample
    contract of `scale`.  (The plane-major student loop in ifnet_apply
    does its own scaling in the plane layout and calls
    ifblock_conv_core directly; this wrapper serves the teacher block
    and standalone use.)
    """
    if scale != 1 and not prescaled:
        x = scale_by(x, 1.0 / scale)
    if flow is not None:
        if not prescaled:
            flow = scale_by(flow, 1.0 / scale) * (1.0 / scale)
        x = jnp.concatenate([x, flow], -1)
    tmp = ifblock_conv_core(p, x, half_res)
    up = scale if half_res else scale * 2
    if up != 1:
        tmp = scale_by(tmp, up)
    flow_out = tmp[..., :4] * up
    mask = tmp[..., 4:5]
    return flow_out, mask


def init_ifnet(key, cfg: IFNetConfig = IFNetConfig()) -> dict:
    ks = jax.random.split(key, 6)
    params = {
        f"block{i}": init_ifblock(ks[i], cin, c)
        for i, (cin, c) in enumerate(zip(cfg.block_in, cfg.block_channels))
    }
    params["block_tea"] = init_ifblock(ks[3], cfg.teacher_in, cfg.teacher_channels)
    if cfg.refine:
        params["contextnet"] = init_contextnet(ks[4])
        params["unet"] = init_unet(ks[5])
    return params


def ifnet_apply(params, img0, img1, *, scale_list=(4.0, 2.0, 1.0), timestep=0.5,
                gt=None, cfg: IFNetConfig = IFNetConfig(), refine: bool | None = None):
    """Full forward pass.

    Args:
      img0, img1: (N, H, W, 3), H and W multiples of the pad granularity.
      scale_list: per-level working-resolution divisors (already divided
        by the user `scale` knob, reference model/RIFE.py:57-58).
      timestep:   scalar or (N,1,1,1); used only for variant="rife_m".
      gt:         (N, H, W, 3) ground truth; presence statically enables
        the teacher + distillation branch (reference IFNet.py:88-102).

    Returns dict with flow_list, mask_list, merged (list of 3),
    flow_teacher, merged_teacher, loss_distill.
    """
    cat = jnp.concatenate
    do_refine = cfg.refine if refine is None else refine
    tplane = None
    if cfg.timestep_plane:
        n, h, w, _ = img0.shape
        tplane = jnp.broadcast_to(
            jnp.asarray(timestep, img0.dtype).reshape((-1, 1, 1, 1)), (n, h, w, 1)
        ).astype(img0.dtype)

    # Plane-major student loop: every full-resolution small-C tensor
    # (images-for-warping, flow, mask, warped frames) lives in the
    # (N, C, H, W) plane layout, which keeps (H, W) dense in the TPU's
    # (8,128) tile; NHWC (C in lanes) wastes up to 17x HBM bandwidth at
    # these channel counts (docs/PERFORMANCE.md 'layout tax').  NHWC
    # appears only where convs consume, at working resolution, via one
    # relayout of the full concat.
    #
    # fast_level0 is an inference-only approximation (merged[0] would
    # feed the distillation loss in training).
    fast0 = cfg.fast_level0 and gt is None and not cfg.half_res \
        and scale_list[1] != 1
    # rung 3 (ladder): when the FINAL level also works below full res
    # (engine fast=3 maps scale_list (4,2,1) -> (4,2,2)), build block2's
    # input at its working resolution too — the level-1 warps run at the
    # res block2 consumes instead of full-res-then-downsample.
    fast1 = fast0 and scale_list[2] != 1
    fastr = cfg.fast_refine and gt is None and not cfg.half_res
    img0_pl = to_planes(img0)
    img1_pl = to_planes(img1)
    tplane_pl = to_planes(tplane) if tplane is not None else None
    flow_pl = None
    mask_pl = None
    w0_pl, w1_pl = img0_pl, img1_pl
    flow_list, mask_list, merged = [], [], []

    def block_out(p, xcat, s, planes=False):
        """Run the conv core and return (flow_d, mask_d) planes at full
        resolution — the output upsample happens in plane layout.
        planes=True: xcat is the (N, C, H, W) plane concat and the stem
        consumes it directly (no from_planes relayout)."""
        tmp = ifblock_conv_core(p, xcat, cfg.half_res, planes=planes)
        up = s if cfg.half_res else s * 2
        tmp_pl = to_planes(tmp)
        if up != 1:
            if float(up) == int(up):
                tmp_pl = plane_up(tmp_pl, int(up))
            else:  # non-integer contract: exactness over speed
                tmp_pl = to_planes(scale_by(from_planes(tmp_pl), up))
        return tmp_pl[:, :4] * up, tmp_pl[:, 4:5]

    for i in range(3):
        p = params[f"block{i}"]
        s = scale_list[i]
        if flow_pl is None:
            # block0: the reference's single x(1/s) interpolate is a
            # separable fixed 2-tap for even integer s — run it on the
            # dense plane concat (plane_down_int, bit-exact vs scale_by)
            # instead of paying the full-res 6ch lane-sparse NHWC resize.
            parts_pl = [img0_pl, img1_pl]
            if tplane_pl is not None:
                parts_pl.append(tplane_pl)
            x_pl = cat(parts_pl, 1)
            if _even_int(s):
                x_pl = plane_down_int(x_pl, int(s))
                flow_d_pl, mask_d_pl = block_out(p, x_pl, s, planes=True)
            else:
                x = from_planes(x_pl)
                if s != 1:
                    x = scale_by(x, 1.0 / s)
                flow_d_pl, mask_d_pl = block_out(p, x, s)
            flow_pl, mask_pl = flow_d_pl, mask_d_pl
        elif (fast0 and i == 1) or (fast1 and i == 2):
            # Build the block's input directly at its working resolution:
            # warp scaled images by scaled flow instead of warping
            # full-res and letting the block downsample the 17ch concat.
            inv = 1.0 / s
            if s == 2:
                img0s_pl = plane_down2(img0_pl)
                img1s_pl = plane_down2(img1_pl)
            elif _even_int(s):
                img0s_pl = plane_down_int(img0_pl, int(s))
                img1s_pl = plane_down_int(img1_pl, int(s))
            else:
                img0s_pl = to_planes(scale_by(img0, inv))
                img1s_pl = to_planes(scale_by(img1, inv))
            if s == 2:
                flow_s_pl = plane_down2(flow_pl) * inv
                mask_s_pl = plane_down2(mask_pl)
            elif _even_int(s):
                flow_s_pl = plane_down_int(flow_pl, int(s)) * inv
                mask_s_pl = plane_down_int(mask_pl, int(s))
            else:
                flow_s_pl = to_planes(scale_by(from_planes(flow_pl), inv)) * inv
                mask_s_pl = to_planes(scale_by(from_planes(mask_pl), inv))
            w0s_pl, w1s_pl = warp2_planes(
                img0s_pl, img1s_pl,
                flow_s_pl[:, 0:2], flow_s_pl[:, 2:4])
            parts_pl = [img0s_pl, img1s_pl]
            if tplane_pl is not None:
                parts_pl.append(to_planes(scale_by(tplane, inv)))
            parts_pl += [w0s_pl, w1s_pl, mask_s_pl, flow_s_pl]
            xcat_pl = cat(parts_pl, 1)
            flow_d_pl, mask_d_pl = block_out(p, xcat_pl, s, planes=True)
            flow_pl = flow_pl + flow_d_pl
            mask_pl = mask_pl + mask_d_pl
        else:
            # Working-res input: downscale the 13(+1)ch stack and the
            # flow in plane layout, then ONE planes->NHWC relayout of
            # the full 17(+1)ch concat inside the stem.  x0.5 bilinear
            # == exact 2x2 mean, so plane_down2 matches the reference
            # interpolate.
            parts_pl = [img0_pl, img1_pl]
            if tplane_pl is not None:
                parts_pl.append(tplane_pl)
            parts_pl += [w0_pl, w1_pl, mask_pl]
            stack_pl = cat(parts_pl, 1)
            fl_pl = flow_pl
            if s == 2:
                stack_pl = plane_down2(stack_pl)
                fl_pl = plane_down2(fl_pl) * 0.5
            elif _even_int(s):  # UHD / scale<1 levels: dense 2-tap
                stack_pl = plane_down_int(stack_pl, int(s))
                fl_pl = plane_down_int(fl_pl, int(s)) * (1.0 / s)
            elif s != 1:
                stack_pl = to_planes(scale_by(from_planes(stack_pl), 1.0 / s))
                fl_pl = to_planes(scale_by(from_planes(fl_pl), 1.0 / s)) * (1.0 / s)
            xcat_pl = cat([stack_pl, fl_pl.astype(stack_pl.dtype)], 1)
            flow_d_pl, mask_d_pl = block_out(p, xcat_pl, s, planes=True)
            flow_pl = flow_pl + flow_d_pl
            mask_pl = mask_pl + mask_d_pl
        mask_list.append(jax.nn.sigmoid(mask_pl))
        flow_list.append(flow_pl)
        if (fast0 and i == 0) or (fast1 and i == 1):
            # these levels' warps are consumed only by the next block
            # (handled above at ITS working res) and by the dead
            # merged[i] blend — placeholders keep the pytree shape; XLA
            # DCEs the blend.
            merged.append((img0_pl, img1_pl))
        elif i == 2 and gt is None:
            # Final level, inference: fuse the pair warp with the
            # sigmoid-mask blend epilogue (reference IFNet.py:82,99 —
            # one kernel instead of warp pair + XLA blend; w0/w1 are
            # co-emitted only when the U-Net concat still needs them
            # at full resolution (fast_refine re-warps at half res).
            need_pair = do_refine and not fastr
            fused = warp2_blend_planes(img0_pl, img1_pl, flow_pl,
                                       mask_pl, need_pair=need_pair)
            if need_pair:
                blend_final_pl, w0_pl, w1_pl = fused
            else:
                blend_final_pl = fused
            merged.append((img0_pl, img1_pl))  # placeholder (overridden)
        else:
            w0_pl, w1_pl = warp2_planes(
                img0_pl, img1_pl, flow_pl[:, 0:2], flow_pl[:, 2:4])
            merged.append((w0_pl, w1_pl))

    flow_teacher = None
    merged_teacher = None
    loss_distill = jnp.zeros((), img0.dtype)
    if gt is not None:
        # Teacher + distillation run NHWC (training-only graphs).
        warped0 = from_planes(w0_pl)
        warped1 = from_planes(w1_pl)
        mask = from_planes(mask_pl)
        flow = from_planes(flow_pl)
        x = cat(
            [img0, img1]
            + ([tplane] if tplane is not None else [])
            + [warped0, warped1, mask, gt],
            -1,
        )
        flow_d, mask_d = ifblock_apply(params["block_tea"], x, flow, 1.0, cfg.half_res)
        flow_teacher = flow + flow_d
        # Plane-path warps so the pallas impl's kernel-grad VJP covers
        # the teacher pair too (identical values on the xla impl).
        ft_pl = to_planes(flow_teacher)
        w0t_pl, w1t_pl = warp2_planes(img0_pl, img1_pl,
                                      ft_pl[:, 0:2], ft_pl[:, 2:4])
        w0_t, w1_t = from_planes(w0t_pl), from_planes(w1t_pl)
        mask_teacher = jax.nn.sigmoid(mask + mask_d)
        merged_teacher = w0_t * mask_teacher + w1_t * (1 - mask_teacher)

    # Blend in plane layout; convert API outputs to NHWC at the end
    # (inference keeps only merged[-1], XLA DCEs the rest).
    for i in range(3):
        if i == 2 and gt is None:
            merged[i] = from_planes(blend_final_pl)  # fused epilogue
        else:
            merged[i] = from_planes(
                merged[i][0] * mask_list[i] + merged[i][1] * (1 - mask_list[i]))
    flow_list = [from_planes(f) for f in flow_list]
    mask_list = [from_planes(m) for m in mask_list]

    if gt is not None:
        for i in range(3):
            # Privileged distillation: supervise student flow where the
            # teacher reconstructs gt better by >0.01 (IFNet.py:100-102).
            err_s = jnp.mean(jnp.abs(merged[i] - gt), axis=-1, keepdims=True)
            err_t = jnp.mean(jnp.abs(merged_teacher - gt), axis=-1, keepdims=True)
            loss_mask = jax.lax.stop_gradient((err_s > err_t + 0.01).astype(img0.dtype))
            dist = jnp.sqrt(
                jnp.mean(
                    (jax.lax.stop_gradient(flow_teacher) - flow_list[i]) ** 2,
                    axis=-1,
                    keepdims=True,
                )
            )
            loss_distill = loss_distill + jnp.mean(dist * loss_mask)

    if do_refine:
        if fastr:
            # Half-res refine (fast_refine): the contextnet pyramid, the
            # U-Net, and all their warps run one octave down; the 3ch
            # sigmoid residual upsamples back (bilinear, like the block
            # output contract).  res*2-1 is affine, so it commutes with
            # the interpolation — apply it after the upsample.
            img0r_pl = plane_down2(img0_pl)
            img1r_pl = plane_down2(img1_pl)
            flow_r_pl = plane_down2(flow_pl) * 0.5
            mask_r_pl = plane_down2(mask_pl)
            w0r_pl, w1r_pl = warp2_planes(
                img0r_pl, img1r_pl, flow_r_pl[:, 0:2], flow_r_pl[:, 2:4])
            c0, c1 = contextnet_apply_pair(
                params["contextnet"], img0r_pl, img1r_pl,
                flow_r_pl[:, 0:2], flow_r_pl[:, 2:4], cfg.half_res,
                planes=True)
            x17_pl = cat([img0r_pl, img1r_pl, w0r_pl, w1r_pl, mask_r_pl,
                          flow_r_pl], 1)
            res = unet_apply(params["unet"], x17_pl, c0, c1, cfg.half_res,
                             planes=True)
            res = from_planes(plane_up(to_planes(res), 2)) * 2 - 1
        else:
            c0, c1 = contextnet_apply_pair(
                params["contextnet"], img0_pl, img1_pl,
                flow_pl[:, 0:2], flow_pl[:, 2:4], cfg.half_res, planes=True
            )
            x17_pl = cat([img0_pl, img1_pl, w0_pl, w1_pl, mask_pl, flow_pl], 1)
            res = unet_apply(params["unet"], x17_pl, c0, c1, cfg.half_res,
                             planes=True)
            res = res * 2 - 1
        merged[2] = jnp.clip(merged[2] + res, 0.0, 1.0)

    return {
        "flow_list": flow_list,
        "mask_list": mask_list,
        "merged": merged,
        "flow_teacher": flow_teacher,
        "merged_teacher": merged_teacher,
        "loss_distill": loss_distill,
    }
