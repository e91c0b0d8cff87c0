"""rife_tpu — TPU-native video frame interpolation framework.

A from-scratch JAX/XLA/Pallas implementation of the RIFE family of
real-time intermediate flow estimation models (reference:
Dk0071942/ECCV2022-RIFE), designed TPU-first:

- NHWC layouts, bf16 compute with f32 accumulation on the MXU
- whole-forward jit: IFNet pyramid + warp + context/U-Net fusion is one
  XLA graph per padded-shape bucket
- data parallelism via jax.sharding.Mesh + NamedSharding (ICI collectives)
- host-side double-buffered video pipeline around the device graph
"""

__version__ = "0.1.0"
