from rife_tpu.engine.inference import InferenceEngine
from rife_tpu.engine.schedule import (
    midpoint_tree,
    exp_doubling,
    bisect_to_ratio,
    timestep_frames,
)
from rife_tpu.engine.checkpoint import save_params, load_params, load_checkpoint

__all__ = [
    "InferenceEngine",
    "midpoint_tree",
    "exp_doubling",
    "bisect_to_ratio",
    "timestep_frames",
    "save_params",
    "load_params",
    "load_checkpoint",
]
