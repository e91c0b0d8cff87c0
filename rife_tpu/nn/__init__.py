from rife_tpu.nn.layers import (
    conv2d,
    conv_transpose2d,
    prelu,
    leaky_relu,
    conv_prelu,
    conv2d_planes,
    conv_prelu_planes,
    pixel_shuffle,
)
from rife_tpu.nn.init import (
    init_conv,
    init_conv_transpose,
    init_prelu,
    conv_prelu_params,
    deconv_prelu_params,
)

__all__ = [
    "conv2d",
    "conv_transpose2d",
    "prelu",
    "leaky_relu",
    "conv_prelu",
    "conv2d_planes",
    "conv_prelu_planes",
    "pixel_shuffle",
    "init_conv",
    "init_conv_transpose",
    "init_prelu",
    "conv_prelu_params",
    "deconv_prelu_params",
]
