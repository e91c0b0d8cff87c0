"""Export rife_tpu params back to reference torch state dicts.

The inverse of rife_tpu.models.torch_import: a model trained here can
be saved as a `flownet.pkl` that the reference repo loads directly
(model/RIFE.py:42-50 load_model), so users can move in BOTH directions
between the frameworks.  Weight layout inverses:

- conv: ours (kh, kw, cin, cout) -> torch (cout, cin, kh, kw)
- deconv: ours stores the kernel pre-flipped as (kh, kw, cin, cout);
  torch ConvTranspose2d wants (cin, cout, kh, kw) unflipped.
- PReLU alpha: (c,) either way.
"""
from __future__ import annotations

import numpy as np

from rife_tpu.models.ifnet import IFNetConfig


def _conv_w_out(w) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(w, np.float32).transpose(3, 2, 0, 1))


def _deconv_w_out(w) -> np.ndarray:
    w = np.asarray(w, np.float32).transpose(2, 3, 0, 1)  # (kh,kw,I,O)->(I,O,kh,kw)
    return np.ascontiguousarray(np.flip(w, (2, 3)))


def _f32(x) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(x, np.float32))


def _conv_prelu_out(sd, prefix, p):
    sd[f"{prefix}.0.weight"] = _conv_w_out(p["conv"]["w"])
    sd[f"{prefix}.0.bias"] = _f32(p["conv"]["b"])
    sd[f"{prefix}.1.weight"] = _f32(p["alpha"])


def _conv2_out(sd, prefix, p):
    _conv_prelu_out(sd, f"{prefix}.conv1", p["conv1"])
    _conv_prelu_out(sd, f"{prefix}.conv2", p["conv2"])


def _ifblock_out(sd, prefix, p):
    for j in range(2):
        _conv_prelu_out(sd, f"{prefix}.conv0.{j}", p["conv0"][j])
    for k in range(8):
        _conv_prelu_out(sd, f"{prefix}.convblock.{k}", p["convblock"][k])
    sd[f"{prefix}.lastconv.weight"] = _deconv_w_out(p["lastconv"]["w"])
    sd[f"{prefix}.lastconv.bias"] = _f32(p["lastconv"]["b"])


def export_ifnet(params, cfg: IFNetConfig = IFNetConfig()) -> dict:
    """params -> reference IFNet/IFNet_m/2R state dict (numpy values).

    Inverse of torch_import.import_ifnet: includes the teacher block
    and contextnet/unet when present.  Pass through `to_torch_pickle`
    (or `torch.save({k: torch.from_numpy(v) for ...})`) to produce a
    flownet.pkl the reference's Model.load_model accepts.
    """
    sd: dict = {}
    for i in range(3):
        _ifblock_out(sd, f"block{i}", params[f"block{i}"])
    if "block_tea" in params:
        _ifblock_out(sd, "block_tea", params["block_tea"])
    if "contextnet" in params:
        for n in range(1, 5):
            _conv2_out(sd, f"contextnet.conv{n}", params["contextnet"][f"conv{n}"])
        unet = params["unet"]
        for n in range(4):
            _conv2_out(sd, f"unet.down{n}", unet[f"down{n}"])
        for n in range(4):
            up = unet[f"up{n}"]
            sd[f"unet.up{n}.0.weight"] = _deconv_w_out(up["conv"]["w"])
            sd[f"unet.up{n}.0.bias"] = _f32(up["conv"]["b"])
            sd[f"unet.up{n}.1.weight"] = _f32(up["alpha"])
        sd["unet.conv.weight"] = _conv_w_out(unet["conv"]["w"])
        sd["unet.conv.bias"] = _f32(unet["conv"]["b"])
    return sd


def save_torch_pickle(path: str, sd: dict):
    """Write a torch-loadable .pkl (requires torch; values -> tensors)."""
    import torch

    torch.save({k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}, path)
