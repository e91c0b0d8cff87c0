"""VGG19 perceptual loss (reference model/loss.py:83-121).

The reference builds this from torchvision's pretrained VGG19 but never
wires it into training (commented out at train_log/RIFE_HDv3.py:22,75);
we provide the same capability: feature distances at VGG19 relu slices
[2, 7, 12, 21, 30] with weights [1/2.6, 1/4.8, 1/3.7, 1/5.6, 10/1.5],
after ImageNet mean/std normalization (the reference's MeanShift conv).

Pretrained weights cannot be downloaded in air-gapped environments, so
construction takes an explicit weights source:

    params = load_vgg19_features("/path/vgg19.npz")        # converted
    params = import_torchvision_vgg19(torch_state_dict)    # torch sd
    loss = vgg_perceptual_loss(params, pred, target)
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from jax import lax

# VGG19 feature-extractor conv layout up to index 30 (conv indices in
# torchvision's features Sequential).
_VGG19_CONVS = [0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28]
_SLICE_AFTER_CONV = [1, 3, 5, 9, 13]  # feature taps ~ [2, 7, 12, 21, 30]
_WEIGHTS = [1.0 / 2.6, 1.0 / 4.8, 1.0 / 3.7, 1.0 / 5.6, 10.0 / 1.5]

_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)


def import_torchvision_vgg19(sd: dict) -> list[dict]:
    """torchvision vgg19().features state dict -> list of conv params."""
    params = []
    for idx in _VGG19_CONVS:
        w = sd[f"features.{idx}.weight"]
        b = sd[f"features.{idx}.bias"]
        w = w.detach().cpu().numpy() if hasattr(w, "detach") else np.asarray(w)
        b = b.detach().cpu().numpy() if hasattr(b, "detach") else np.asarray(b)
        params.append({"w": np.ascontiguousarray(w.transpose(2, 3, 1, 0)), "b": b})
    return params


def load_vgg19_features(path: str) -> list[dict]:
    data = np.load(path)
    return [{"w": data[f"w{i}"], "b": data[f"b{i}"]} for i in range(len(_VGG19_CONVS))]


def save_vgg19_features(path: str, params: list[dict]):
    np.savez(path, **{f"w{i}": p["w"] for i, p in enumerate(params)},
             **{f"b{i}": p["b"] for i, p in enumerate(params)})


def _features(params, x):
    feats = []
    conv_count = 0
    for i, p in enumerate(params):
        x = lax.conv_general_dilated(
            x, jnp.asarray(p["w"], x.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype) + jnp.asarray(p["b"], x.dtype)
        x = jnp.maximum(x, 0)
        conv_count += 1
        if conv_count in _SLICE_AFTER_CONV:
            feats.append(x)
        if conv_count in (2, 4, 8, 12):  # maxpool positions in VGG19
            x = lax.reduce_window(
                x, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    return feats


def vgg_perceptual_loss(params, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Weighted L1 over VGG19 feature slices; pred/target NHWC [0,1]."""
    mean = jnp.asarray(_MEAN, pred.dtype)
    std = jnp.asarray(_STD, pred.dtype)
    fp = _features(params, (pred - mean) / std)
    ft = _features(params, (target - mean) / std)
    loss = jnp.zeros((), jnp.float32)
    # Per-term 0.1 factor and detached targets match the reference
    # (model/loss.py:118-119: `weights[k] * (X - Y.detach()).abs().mean() * 0.1`)
    # so reference loss-weight hyperparameters transfer unchanged.
    for w, a, b in zip(_WEIGHTS, fp, ft):
        b = lax.stop_gradient(b)
        loss = loss + 0.1 * w * jnp.mean(
            jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))
    return loss
