"""Op-level parity vs torch CPU ground truth.

These pin the exact coordinate/padding conventions the model depends on
(SURVEY.md §7 "hard parts" #1-2): bilinear resize with align_corners=False,
grid_sample(align_corners=True, padding_mode='border'), volumetric SSIM,
and the Laplacian pyramid loss.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from rife_tpu.ops import (
    lap_loss,
    msssim,
    pad_centered,
    pad_to_multiple,
    resize_bilinear,
    ssim,
    ssim_matlab,
    warp,
)


def nchw(x_nhwc: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.ascontiguousarray(np.moveaxis(x_nhwc, -1, 1)))


def nhwc(t: torch.Tensor) -> np.ndarray:
    return np.moveaxis(t.detach().numpy(), 1, -1)


@pytest.mark.parametrize("in_hw,factor", [
    ((32, 48), 0.5),
    ((32, 48), 0.25),
    ((32, 48), 2.0),
    ((16, 24), 4.0),
    ((8, 12), 8.0),
    ((30, 46), 0.5),
    ((17, 23), 2.0),
])
def test_resize_matches_torch_interpolate(rng, in_hw, factor):
    x = rng.standard_normal((2, *in_hw, 3), dtype=np.float32)
    ref = F.interpolate(nchw(x), scale_factor=factor, mode="bilinear",
                        align_corners=False, recompute_scale_factor=False)
    out_hw = tuple(ref.shape[2:])
    got = np.asarray(resize_bilinear(jnp.asarray(x), out_hw))
    np.testing.assert_allclose(got, nhwc(ref), rtol=1e-5, atol=1e-5)


def test_resize_identity(rng):
    x = rng.standard_normal((1, 8, 8, 2), dtype=np.float32)
    np.testing.assert_array_equal(np.asarray(resize_bilinear(jnp.asarray(x), (8, 8))), x)


def _torch_refwarp(img: torch.Tensor, flow: torch.Tensor) -> torch.Tensor:
    # Reference normalization (model/warplayer.py:8-22) via torch API.
    n, _, h, w = flow.shape
    hor = torch.linspace(-1.0, 1.0, w).view(1, 1, 1, w).expand(n, -1, h, -1)
    ver = torch.linspace(-1.0, 1.0, h).view(1, 1, h, 1).expand(n, -1, -1, w)
    grid = torch.cat([hor, ver], 1)
    nflow = torch.cat([flow[:, 0:1] / ((w - 1.0) / 2.0),
                       flow[:, 1:2] / ((h - 1.0) / 2.0)], 1)
    g = (grid + nflow).permute(0, 2, 3, 1)
    return F.grid_sample(img, g, mode="bilinear", padding_mode="border", align_corners=True)


@pytest.mark.parametrize("mag", [0.0, 0.5, 3.7, 25.0])
def test_warp_matches_grid_sample(rng, mag):
    h, w = 24, 36
    img = rng.standard_normal((2, h, w, 3), dtype=np.float32)
    flow = (rng.standard_normal((2, h, w, 2)) * mag).astype(np.float32)
    ref = _torch_refwarp(nchw(img), nchw(flow))
    got = np.asarray(warp(jnp.asarray(img), jnp.asarray(flow)))
    np.testing.assert_allclose(got, nhwc(ref), rtol=1e-4, atol=1e-4)


def test_warp_zero_flow_is_identity(rng):
    img = rng.standard_normal((1, 16, 16, 4), dtype=np.float32)
    out = np.asarray(warp(jnp.asarray(img), jnp.zeros((1, 16, 16, 2))))
    np.testing.assert_allclose(out, img, atol=1e-6)


def _torch_gaussian(window_size, sigma=1.5):
    g = torch.tensor([float(np.exp(-((x - window_size // 2) ** 2) / (2 * sigma**2)))
                      for x in range(window_size)])
    return g / g.sum()


def _torch_ssim(img1, img2, window_size=11):
    # Reference ssim (pytorch_msssim/__init__.py:27-78) via torch API.
    channel = img1.shape[1]
    _1d = _torch_gaussian(window_size).unsqueeze(1)
    window = _1d.mm(_1d.t()).float().unsqueeze(0).unsqueeze(0)
    window = window.expand(channel, 1, window_size, window_size).contiguous()
    L = 1.0
    pad = lambda x: F.pad(x, (5, 5, 5, 5), mode="replicate")
    mu1 = F.conv2d(pad(img1), window, groups=channel)
    mu2 = F.conv2d(pad(img2), window, groups=channel)
    mu1_sq, mu2_sq, mu1_mu2 = mu1**2, mu2**2, mu1 * mu2
    s1 = F.conv2d(pad(img1 * img1), window, groups=channel) - mu1_sq
    s2 = F.conv2d(pad(img2 * img2), window, groups=channel) - mu2_sq
    s12 = F.conv2d(pad(img1 * img2), window, groups=channel) - mu1_mu2
    C1, C2 = 0.01**2, 0.03**2
    v1, v2 = 2 * s12 + C2, s1 + s2 + C2
    ssim_map = ((2 * mu1_mu2 + C1) * v1) / ((mu1_sq + mu2_sq + C1) * v2)
    return ssim_map.mean(), (v1 / v2).mean()


def _torch_ssim_matlab(img1, img2, window_size=11):
    # Reference ssim_matlab (pytorch_msssim/__init__.py:81-134) via torch API.
    _1d = _torch_gaussian(window_size).unsqueeze(1)
    _2d = _1d.mm(_1d.t())
    _3d = _2d.unsqueeze(2) @ _1d.t()
    window = _3d.expand(1, 1, window_size, window_size, window_size).contiguous()
    i1 = img1.unsqueeze(1)
    i2 = img2.unsqueeze(1)
    L = 1.0
    pad = lambda x: F.pad(x, (5, 5, 5, 5, 5, 5), mode="replicate")
    mu1 = F.conv3d(pad(i1), window)
    mu2 = F.conv3d(pad(i2), window)
    mu1_sq, mu2_sq, mu1_mu2 = mu1**2, mu2**2, mu1 * mu2
    s1 = F.conv3d(pad(i1 * i1), window) - mu1_sq
    s2 = F.conv3d(pad(i2 * i2), window) - mu2_sq
    s12 = F.conv3d(pad(i1 * i2), window) - mu1_mu2
    C1, C2 = 0.01**2, 0.03**2
    v1, v2 = 2 * s12 + C2, s1 + s2 + C2
    ssim_map = ((2 * mu1_mu2 + C1) * v1) / ((mu1_sq + mu2_sq + C1) * v2)
    return ssim_map.mean()


def test_ssim_matches_torch(rng):
    a = rng.random((2, 33, 47, 3), dtype=np.float32)
    b = np.clip(a + rng.standard_normal(a.shape).astype(np.float32) * 0.05, 0, 1)
    ref, _ = _torch_ssim(nchw(a), nchw(b))
    got = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    assert abs(got - float(ref)) < 1e-5


@pytest.mark.parametrize("hw", [(32, 32), (64, 48)])
def test_ssim_matlab_matches_torch(rng, hw):
    a = rng.random((1, *hw, 3), dtype=np.float32)
    b = np.clip(a + rng.standard_normal(a.shape).astype(np.float32) * 0.1, 0, 1)
    ref = _torch_ssim_matlab(nchw(a), nchw(b))
    got = float(ssim_matlab(jnp.asarray(a), jnp.asarray(b)))
    assert abs(got - float(ref)) < 1e-5


def test_ssim_matlab_identical_images_is_one(rng):
    a = rng.random((1, 32, 32, 3), dtype=np.float32)
    assert float(ssim_matlab(jnp.asarray(a), jnp.asarray(a))) > 0.9999


def _torch_lap_loss(x, y, max_levels=5):
    # Reference LapLoss (model/laplacian.py) via torch API.
    k = torch.tensor([[1., 4., 6., 4., 1.], [4., 16., 24., 16., 4.],
                      [6., 24., 36., 24., 6.], [4., 16., 24., 16., 4.],
                      [1., 4., 6., 4., 1.]]) / 256.0
    C = x.shape[1]
    kern = k.repeat(C, 1, 1, 1)

    def conv_gauss(img, kernel):
        img = F.pad(img, (2, 2, 2, 2), mode="reflect")
        return F.conv2d(img, kernel, groups=img.shape[1])

    def pyramid(img):
        current, pyr = img, []
        for _ in range(max_levels):
            filtered = conv_gauss(current, kern)
            down = filtered[:, :, ::2, ::2]
            up = torch.zeros(down.shape[0], down.shape[1], down.shape[2] * 2, down.shape[3] * 2)
            up[:, :, ::2, ::2] = down
            up = conv_gauss(up, 4 * kern)
            pyr.append(current - up)
            current = down
        return pyr

    return sum(F.l1_loss(a, b) for a, b in zip(pyramid(x), pyramid(y)))


def test_lap_loss_matches_torch(rng):
    a = rng.random((2, 64, 64, 3), dtype=np.float32)
    b = rng.random((2, 64, 64, 3), dtype=np.float32)
    ref = float(_torch_lap_loss(nchw(a), nchw(b)))
    got = float(lap_loss(jnp.asarray(a), jnp.asarray(b)))
    assert abs(got - ref) < 1e-5


def test_pad_to_multiple_roundtrip(rng):
    x = rng.random((1, 100, 130, 3), dtype=np.float32)
    padded, p = pad_to_multiple(jnp.asarray(x), 32)
    assert padded.shape[1] % 32 == 0 and padded.shape[2] % 32 == 0
    assert p.top == 0 and p.left == 0
    np.testing.assert_array_equal(np.asarray(p.crop(padded)), x)


def test_pad_centered_min512(rng):
    x = rng.random((1, 100, 130, 3), dtype=np.float32)
    padded, p = pad_centered(jnp.asarray(x), 32, 512)
    assert padded.shape[1] == 512 and padded.shape[2] == 512
    np.testing.assert_array_equal(np.asarray(p.crop(padded)), x)


def test_msssim_runs(rng):
    a = rng.random((1, 64, 64, 3), dtype=np.float32)
    b = np.clip(a + 0.02 * rng.standard_normal(a.shape).astype(np.float32), 0, 1)
    v = float(msssim(jnp.asarray(a), jnp.asarray(b)))
    assert 0.5 < v <= 1.0
