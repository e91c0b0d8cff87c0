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


def _fold_bn(sd, conv_key: str, bn_key: str) -> dict:
    """Fold eval-mode BatchNorm2d into the preceding bias-free conv:
    w' = w * gamma/sqrt(var+eps) (per out channel), b' = beta - mean*scale.
    Exact for inference (v1's IFNet_HD uses conv(bias=False)+BN throughout,
    IFNet_HD.py:10-24)."""
    w = conv_w(sd[f"{conv_key}.weight"])  # HWIO; O is the last axis
    g = _np(sd[f"{bn_key}.weight"]).astype(np.float64)
    b = _np(sd[f"{bn_key}.bias"]).astype(np.float64)
    m = _np(sd[f"{bn_key}.running_mean"]).astype(np.float64)
    v = _np(sd[f"{bn_key}.running_var"]).astype(np.float64)
    s = g / np.sqrt(v + 1e-5)
    return {"w": (w * s).astype(np.float32), "b": (b - m * s).astype(np.float32)}


def _se_res_hd_flow(sd, prefix) -> dict:
    """IFNet_HD.ResBlock (IFNet_HD.py:27-49): conv1 5x5 + BN + PReLU,
    conv2 3x3 + BN, SE gate; conv0 is Identity (same width, stride 1)."""
    return {
        "conv1": {"conv": _fold_bn(sd, f"{prefix}.conv1.0", f"{prefix}.conv1.1"),
                  "alpha": _np(sd[f"{prefix}.conv1.2.weight"]).reshape(-1)},
        "conv2": _fold_bn(sd, f"{prefix}.conv2.0", f"{prefix}.conv2.1"),
        "relu1": _np(sd[f"{prefix}.relu1.weight"]).reshape(-1),
        "relu2": _np(sd[f"{prefix}.relu2.weight"]).reshape(-1),
        "fc1": {"w": conv_w(sd[f"{prefix}.fc1.weight"])},
        "fc2": {"w": conv_w(sd[f"{prefix}.fc2.weight"])},
    }


def _se_res_hd(sd, prefix) -> dict:
    """RIFE_HD.ResBlock (RIFE_HD.py:37-61): stride-2, biased convs, no BN;
    conv0 is a real 3x3/s2 shortcut conv."""
    return {
        "conv0": {"w": conv_w(sd[f"{prefix}.conv0.weight"])},
        "conv1": _conv_prelu(sd, f"{prefix}.conv1"),
        "conv2": {"w": conv_w(sd[f"{prefix}.conv2.0.weight"]),
                  "b": _np(sd[f"{prefix}.conv2.0.bias"])},
        "relu1": _np(sd[f"{prefix}.relu1.weight"]).reshape(-1),
        "relu2": _np(sd[f"{prefix}.relu2.weight"]).reshape(-1),
        "fc1": {"w": conv_w(sd[f"{prefix}.fc1.weight"])},
        "fc2": {"w": conv_w(sd[f"{prefix}.fc2.weight"])},
    }


def import_hd(sd: dict, cfg=None) -> dict:
    """Import legacy v1 three-file checkpoints (oldmodel/RIFE_HD.py:167-189),
    merged under "flownet." / "contextnet." / "fusionnet." prefixes (see
    engine.checkpoint.load_checkpoint).  BatchNorm is folded at import."""
    sd = strip_ddp(sd)
    params = {}
    for i in range(4):
        pre = f"flownet.block{i}"
        blk = {
            "conv0": {"conv": _fold_bn(sd, f"{pre}.conv0.0", f"{pre}.conv0.1"),
                      "alpha": _np(sd[f"{pre}.conv0.2.weight"]).reshape(-1)},
            "conv1": {"w": conv_w(sd[f"{pre}.conv1.weight"]),
                      "b": _np(sd[f"{pre}.conv1.bias"])},
        }
        for j in range(6):
            blk[f"res{j}"] = _se_res_hd_flow(sd, f"{pre}.res{j}")
        params[f"block{i}"] = blk
    ctx = {"conv0": _conv_prelu(sd, "contextnet.conv0")}
    for i in range(1, 5):
        ctx[f"conv{i}"] = _se_res_hd(sd, f"contextnet.conv{i}")
    params["contextnet"] = ctx
    fus = {"conv0": _conv_prelu(sd, "fusionnet.conv0")}
    for i in range(4):
        fus[f"down{i}"] = _se_res_hd(sd, f"fusionnet.down{i}")
    for n in range(4):
        fus[f"up{n}"] = {
            "conv": {"w": deconv_w(sd[f"fusionnet.up{n}.0.weight"]),
                     "b": _np(sd[f"fusionnet.up{n}.0.bias"])},
            "alpha": _np(sd[f"fusionnet.up{n}.1.weight"]).reshape(-1),
        }
    fus["conv"] = {"w": conv_w(sd["fusionnet.conv.weight"]),
                   "b": _np(sd["fusionnet.conv.bias"])}
    params["fusionnet"] = fus
    return params


def load_torch_pickle(path: str) -> dict:
    """Load a torch .pkl checkpoint into numpy arrays (CPU, weights only)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: _np(v) for k, v in sd.items()}
