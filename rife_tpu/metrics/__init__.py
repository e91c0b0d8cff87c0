from rife_tpu.metrics.quality import psnr, psnr_uint8_protocol, interpolation_error, rgb_to_y

__all__ = ["psnr", "psnr_uint8_protocol", "interpolation_error", "rgb_to_y"]
