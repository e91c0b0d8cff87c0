"""Model registry: explicit preset table replacing the reference's
exception-driven auto-detect cascade (reference inference_img.py:25-46,
rife_app/models/loader.py:13-41 try HDv2 -> HDv3 -> HD -> arXiv).

Each entry bundles (config, init, apply, torch importer).  The detection
helper inspects a checkpoint's keys instead of trying imports.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import jax

from rife_tpu.models import ifnet as _ifnet
from rife_tpu.models import v425 as _v425
from rife_tpu.models import legacy as _legacy
from rife_tpu.models import torch_import as _imp


@dataclass(frozen=True)
class ModelDef:
    name: str
    config: Any
    init: Callable
    apply: Callable
    import_torch: Callable
    scale_list: tuple  # default per-level divisors before the /scale knob
    pad_multiple: int = 32  # spatial granularity the pyramid requires


MODEL_REGISTRY: dict[str, ModelDef] = {}


def _register(d: ModelDef):
    MODEL_REGISTRY[d.name] = d


_register(ModelDef(
    name="rife",
    config=_ifnet.IFNetConfig(variant="rife"),
    init=_ifnet.init_ifnet,
    apply=_ifnet.ifnet_apply,
    import_torch=_imp.import_ifnet,
    scale_list=(4.0, 2.0, 1.0),
))
_register(ModelDef(
    name="rife_m",
    config=_ifnet.IFNetConfig(variant="rife_m"),
    init=_ifnet.init_ifnet,
    apply=_ifnet.ifnet_apply,
    import_torch=_imp.import_ifnet,
    scale_list=(4.0, 2.0, 1.0),
))
_register(ModelDef(
    name="rife_2r",
    config=_ifnet.IFNetConfig(variant="rife", half_res=True),
    init=_ifnet.init_ifnet,
    apply=_ifnet.ifnet_apply,
    import_torch=_imp.import_ifnet,
    scale_list=(4.0, 2.0, 1.0),
))
_register(ModelDef(
    name="hd",
    config=_legacy.HDConfig(),
    init=_legacy.init_hd,
    apply=_legacy.hd_apply,
    import_torch=_imp.import_hd,
    scale_list=(1.0,),
))
_register(ModelDef(
    name="hdv2",
    config=_legacy.HDv2Config(),
    init=_legacy.init_hdv2,
    apply=_legacy.hdv2_apply,
    import_torch=_imp.import_hdv2,
    scale_list=(1.0,),
))
_register(ModelDef(
    name="v4.25",
    config=_v425.V425Config(),
    init=_v425.init_v425,
    apply=_v425.v425_apply,
    import_torch=_imp.import_v425,
    scale_list=(16.0, 8.0, 4.0, 2.0, 1.0),
    pad_multiple=64,  # scale-16 level downsamples /4 then upsamples x4
))


def create_model(name: str, seed: int = 0):
    """Returns (ModelDef, params) with fresh torch-default-init params."""
    d = MODEL_REGISTRY[name]
    params = d.init(jax.random.PRNGKey(seed), d.config)
    return d, params


def detect_model_from_state_dict(sd) -> str:
    """Checkpoint version detection from keys + weight shapes (replaces
    the reference's exception-driven import cascade).

    Accepts a state dict (shape-aware: distinguishes rife from rife_m by
    block0's input channels, 6 vs 7) or a bare key iterable.
    """
    shapes = {}
    if hasattr(sd, "items") and sd and not isinstance(next(iter(sd)), int):
        try:
            shapes = {k: tuple(getattr(v, "shape", ())) for k, v in sd.items()}
        except Exception:
            shapes = {}
    keys = set(sd)
    if any(k.startswith("module.") for k in keys):
        keys = {k.replace("module.", "", 1) for k in keys}
        shapes = {k.replace("module.", "", 1): v for k, v in shapes.items()}
    if "encode.cnn0.weight" in keys or "block4.conv0.0.0.weight" in keys:
        return "v4.25"
    if any(".res0." in k for k in keys):
        return "hd"  # v1: SE ResBlocks named res0..res5 (IFNet_HD.py:58-63)
    if any(k.startswith("flownet.block0.conv1.") for k in keys):
        return "hdv2"
    if "block0.conv1.weight" in keys and "block0.convblock.6.0.weight" not in keys:
        # bare HDv2 flownet-only dict (4ch deconv head, 6-conv body)
        return "hdv2"
    if "block0.conv0.0.0.weight" in keys:
        shp = shapes.get("block0.conv0.0.0.weight")
        if shp and len(shp) == 4 and shp[1] == 7:
            return "rife_m"  # timestep plane adds an input channel
        return "rife"
    raise ValueError("unrecognized checkpoint format")
