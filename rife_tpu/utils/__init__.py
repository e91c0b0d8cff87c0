from rife_tpu.utils.imageio import read_image, write_image, to_tensor, to_uint8

__all__ = ["read_image", "write_image", "to_tensor", "to_uint8"]
