from rife_tpu.ops.pallas.warp import warp_pallas

__all__ = ["warp_pallas"]
