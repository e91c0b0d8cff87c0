from rife_tpu.ops.pallas.warp import warp_pallas, warp_pallas_auto, warp_pallas_diff

__all__ = ["warp_pallas", "warp_pallas_auto", "warp_pallas_diff"]
