from rife_tpu.ops.resize import resize_bilinear, scale_by, plane_up, plane_down2, plane_down_int
from rife_tpu.ops.warp import (warp, warp2, warp_xla, set_warp_impl,
                               use_warp_impl, use_fuse_blend, to_planes,
                               from_planes, warp_planes, warp2_planes,
                               warp2_blend_planes, warp_xla_planes)
from rife_tpu.ops.pad import pad_to_multiple, pad_centered, Padding
from rife_tpu.ops.ssim import ssim, ssim_matlab, msssim
from rife_tpu.ops.pyramid import laplacian_pyramid, lap_loss

__all__ = [
    "resize_bilinear",
    "scale_by",
    "warp",
    "warp2",
    "warp_xla",
    "to_planes",
    "from_planes",
    "warp_planes",
    "warp2_planes",
    "warp2_blend_planes",
    "warp_xla_planes",
    "plane_up",
    "plane_down2",
    "plane_down_int",
    "set_warp_impl",
    "use_warp_impl",
    "use_fuse_blend",
    "pad_to_multiple",
    "pad_centered",
    "Padding",
    "ssim",
    "ssim_matlab",
    "msssim",
    "laplacian_pyramid",
    "lap_loss",
]
