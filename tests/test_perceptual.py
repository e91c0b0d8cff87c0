"""VGG perceptual loss: structure test with synthetic weights (no
torchvision / pretrained weights in this environment)."""
import numpy as np

import jax.numpy as jnp

from rife_tpu.train.perceptual import (
    _VGG19_CONVS,
    load_vgg19_features,
    save_vgg19_features,
    vgg_perceptual_loss,
)

_VGG_WIDTHS = [64, 64, 128, 128, 256, 256, 256, 256, 512, 512, 512, 512, 512]


def _tiny_params(rng):
    params = []
    cin = 3
    for co in _VGG_WIDTHS:
        params.append({
            "w": rng.standard_normal((3, 3, cin, co)).astype(np.float32) * 0.05,
            "b": np.zeros((co,), np.float32),
        })
        cin = co
    return params


def test_perceptual_loss_properties(rng, tmp_path):
    params = _tiny_params(rng)
    a = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
    b = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
    same = float(vgg_perceptual_loss(params, a, a))
    diff = float(vgg_perceptual_loss(params, a, b))
    assert same < 1e-6
    assert diff > same and np.isfinite(diff)

    p = str(tmp_path / "vgg.npz")
    save_vgg19_features(p, params)
    loaded = load_vgg19_features(p)
    assert len(loaded) == len(_VGG19_CONVS)
    diff2 = float(vgg_perceptual_loss(loaded, a, b))
    assert abs(diff2 - diff) < 1e-5
