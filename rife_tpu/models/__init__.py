from rife_tpu.models.ifnet import IFNetConfig, init_ifnet, ifnet_apply
from rife_tpu.models.v425 import V425Config, init_v425, v425_apply
from rife_tpu.models.registry import MODEL_REGISTRY, create_model

__all__ = [
    "IFNetConfig",
    "init_ifnet",
    "ifnet_apply",
    "V425Config",
    "init_v425",
    "v425_apply",
    "MODEL_REGISTRY",
    "create_model",
]
