"""Torch state-dict -> rife_tpu param-tree importer.

Needed for capability parity: users of the reference load pretrained
`flownet.pkl` torch checkpoints (reference model/RIFE.py:41-50,
train_log/RIFE_HDv3.py:36-50).  This maps those state dicts onto our
NHWC param trees:

- Conv2d weight OIHW -> HWIO.
- ConvTranspose2d weight (I, O, kh, kw) -> spatially flipped HWIO of the
  equivalent forward conv (see rife_tpu.nn.layers.conv_transpose2d).
- PReLU (C,) and ResConv beta (1,C,1,1) -> (C,).
- DDP "module." prefixes are stripped, mirroring the reference loader.

Loading uses torch.load when torch is importable, else a plain
pickle+numpy fallback would be required — torch (CPU) is a test/import
dependency only; the runtime never touches it.
"""
from __future__ import annotations

import numpy as np

from rife_tpu.models.ifnet import IFNetConfig
from rife_tpu.models.v425 import V425Config


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().numpy()  # torch tensor


def conv_w(t) -> np.ndarray:
    return np.ascontiguousarray(_np(t).transpose(2, 3, 1, 0))


def deconv_w(t) -> np.ndarray:
    w = _np(t)  # (I, O, kh, kw)
    w = np.flip(w, (2, 3))
    return np.ascontiguousarray(w.transpose(2, 3, 0, 1))


def strip_ddp(sd: dict) -> dict:
    if any(k.startswith("module.") for k in sd):
        return {k.replace("module.", "", 1): v for k, v in sd.items() if k.startswith("module.")}
    return sd


def _conv_prelu(sd, prefix) -> dict:
    return {
        "conv": {"w": conv_w(sd[f"{prefix}.0.weight"]), "b": _np(sd[f"{prefix}.0.bias"])},
        "alpha": _np(sd[f"{prefix}.1.weight"]).reshape(-1),
    }


def _conv2(sd, prefix) -> dict:
    return {
        "conv1": _conv_prelu(sd, f"{prefix}.conv1"),
        "conv2": _conv_prelu(sd, f"{prefix}.conv2"),
    }


def _ifblock(sd, prefix) -> dict:
    return {
        "conv0": [_conv_prelu(sd, f"{prefix}.conv0.{j}") for j in range(2)],
        "convblock": [_conv_prelu(sd, f"{prefix}.convblock.{k}") for k in range(8)],
        "lastconv": {
            "w": deconv_w(sd[f"{prefix}.lastconv.weight"]),
            "b": _np(sd[f"{prefix}.lastconv.bias"]),
        },
    }


def import_ifnet(sd: dict, cfg: IFNetConfig = IFNetConfig()) -> dict:
    """Import paper IFNet / IFNet_m / 2R state dicts (model/IFNet*.py)."""
    sd = strip_ddp(sd)
    params = {f"block{i}": _ifblock(sd, f"block{i}") for i in range(3)}
    if "block_tea.conv0.0.0.weight" in sd:
        params["block_tea"] = _ifblock(sd, "block_tea")
    if "contextnet.conv1.conv1.0.weight" in sd:
        params["contextnet"] = {
            f"conv{n}": _conv2(sd, f"contextnet.conv{n}") for n in range(1, 5)
        }
        unet = {f"down{n}": _conv2(sd, f"unet.down{n}") for n in range(4)}
        for n in range(4):
            unet[f"up{n}"] = {
                "conv": {
                    "w": deconv_w(sd[f"unet.up{n}.0.weight"]),
                    "b": _np(sd[f"unet.up{n}.0.bias"]),
                },
                "alpha": _np(sd[f"unet.up{n}.1.weight"]).reshape(-1),
            }
        unet["conv"] = {"w": conv_w(sd["unet.conv.weight"]), "b": _np(sd["unet.conv.bias"])}
        params["unet"] = unet
    return params


def _v425_block(sd, prefix) -> dict:
    return {
        "conv0": [
            {"w": conv_w(sd[f"{prefix}.conv0.{j}.0.weight"]), "b": _np(sd[f"{prefix}.conv0.{j}.0.bias"])}
            for j in range(2)
        ],
        "convblock": [
            {
                "conv": {
                    "w": conv_w(sd[f"{prefix}.convblock.{k}.conv.weight"]),
                    "b": _np(sd[f"{prefix}.convblock.{k}.conv.bias"]),
                },
                "beta": _np(sd[f"{prefix}.convblock.{k}.beta"]).reshape(-1),
            }
            for k in range(8)
        ],
        "lastconv": {
            "w": deconv_w(sd[f"{prefix}.lastconv.0.weight"]),
            "b": _np(sd[f"{prefix}.lastconv.0.bias"]),
        },
    }


def import_v425(sd: dict, cfg: V425Config = V425Config()) -> dict:
    """Import v4.25/HDv3 state dicts (train_log/IFNet_HDv3.py); non-strict
    like the reference loader — teacher/caltime keys are ignored."""
    sd = strip_ddp(sd)
    params = {
        f"block{i}": _v425_block(sd, f"block{i}") for i in range(len(cfg.block_channels))
    }
    params["encode"] = {
        "cnn0": {"w": conv_w(sd["encode.cnn0.weight"]), "b": _np(sd["encode.cnn0.bias"])},
        "cnn1": {"w": conv_w(sd["encode.cnn1.weight"]), "b": _np(sd["encode.cnn1.bias"])},
        "cnn2": {"w": conv_w(sd["encode.cnn2.weight"]), "b": _np(sd["encode.cnn2.bias"])},
        "cnn3": {"w": deconv_w(sd["encode.cnn3.weight"]), "b": _np(sd["encode.cnn3.bias"])},
    }
    return params


def import_hdv2(sd: dict, cfg=None) -> dict:
    """Import legacy v2 three-file checkpoints (oldmodel/RIFE_HDv2.py:152-168).

    `sd` carries the merged state dicts prefixed "flownet." /
    "contextnet." / "fusionnet." (see engine.checkpoint.load_checkpoint,
    which merges the reference's flownet/contextnet/unet.pkl trio).
    """
    sd = strip_ddp(sd)
    params = {}
    for i in range(4):
        pre = f"flownet.block{i}"
        params[f"block{i}"] = {
            "conv0": [_conv_prelu(sd, f"{pre}.conv0.{j}") for j in range(2)],
            "convblock": [_conv_prelu(sd, f"{pre}.convblock.{k}") for k in range(6)],
            "conv1": {
                "w": deconv_w(sd[f"{pre}.conv1.weight"]),
                "b": _np(sd[f"{pre}.conv1.bias"]),
            },
        }
    params["contextnet"] = {
        f"conv{i}": _conv2(sd, f"contextnet.conv{i}") for i in range(5)
    }
    fus = {name: _conv2(sd, f"fusionnet.{name}")
           for name in ("conv0", "down0", "down1", "down2", "down3")}
    for n in range(4):
        fus[f"up{n}"] = {
            "conv": {
                "w": deconv_w(sd[f"fusionnet.up{n}.0.weight"]),
                "b": _np(sd[f"fusionnet.up{n}.0.bias"]),
            },
            "alpha": _np(sd[f"fusionnet.up{n}.1.weight"]).reshape(-1),
        }
    fus["conv"] = {
        "w": deconv_w(sd["fusionnet.conv.weight"]),
        "b": _np(sd["fusionnet.conv.bias"]),
    }
    params["fusionnet"] = fus
    return params


def load_torch_pickle(path: str) -> dict:
    """Load a torch .pkl checkpoint into numpy arrays (CPU, weights only)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: _np(v) for k, v in sd.items()}
