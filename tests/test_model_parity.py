"""Full-model numerical parity vs the reference PyTorch implementation.

The reference repo (mounted read-only at /root/reference) is imported as
ground truth: we instantiate its torch modules with default init, export
the state dict through rife_tpu.models.torch_import, and compare full
forward passes.  This pins the whole semantic chain — resize conventions,
warp, conv/deconv layouts, PReLU, PixelShuffle ordering — in one shot.

Skipped when the reference checkout is absent (end-user machines).
"""
import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference checkout not mounted")

if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)

import torch  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rife_tpu.models import (  # noqa: E402
    IFNetConfig,
    ifnet_apply,
    v425_apply,
)
from rife_tpu.models.torch_import import import_ifnet, import_v425  # noqa: E402


def to_nhwc(t: torch.Tensor) -> jnp.ndarray:
    return jnp.asarray(np.moveaxis(t.detach().numpy(), 1, -1))


def from_nhwc(a) -> np.ndarray:
    return np.moveaxis(np.asarray(a), -1, 1)


def _sd_numpy(module) -> dict:
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def _rand_pair(h=32, w=64, seed=0):
    g = torch.Generator().manual_seed(seed)
    img0 = torch.rand(1, 3, h, w, generator=g)
    img1 = torch.rand(1, 3, h, w, generator=g)
    return img0, img1


def test_ifnet_forward_parity():
    from model.IFNet import IFNet

    torch.manual_seed(7)
    net = IFNet().eval()
    params = import_ifnet(_sd_numpy(net))

    img0, img1 = _rand_pair()
    with torch.no_grad():
        _, _, merged, _, _, _ = net(torch.cat([img0, img1], 1), scale=[4, 2, 1])
    out = ifnet_apply(params, to_nhwc(img0), to_nhwc(img1), cfg=IFNetConfig())
    got = from_nhwc(out["merged"][2])
    ref = merged[2].numpy()
    assert np.abs(got - ref).max() < 2e-4, np.abs(got - ref).max()


def test_ifnet_teacher_parity():
    from model.IFNet import IFNet

    torch.manual_seed(3)
    net = IFNet().eval()
    params = import_ifnet(_sd_numpy(net))

    img0, img1 = _rand_pair(seed=5)
    gt = torch.rand(1, 3, 32, 64, generator=torch.Generator().manual_seed(9))
    with torch.no_grad():
        _, _, merged, flow_tea, merged_tea, loss_distill = net(
            torch.cat([img0, img1, gt], 1), scale=[4, 2, 1]
        )
    out = ifnet_apply(params, to_nhwc(img0), to_nhwc(img1), gt=to_nhwc(gt))
    assert np.abs(from_nhwc(out["merged_teacher"]) - merged_tea.numpy()).max() < 2e-4
    assert np.abs(from_nhwc(out["flow_teacher"]) - flow_tea.numpy()).max() < 2e-3
    assert abs(float(out["loss_distill"]) - float(loss_distill)) < 1e-4


def test_ifnet_m_timestep_parity():
    from model.IFNet_m import IFNet_m

    torch.manual_seed(11)
    net = IFNet_m().eval()
    params = import_ifnet(_sd_numpy(net), IFNetConfig(variant="rife_m"))

    img0, img1 = _rand_pair(seed=2)
    for t in (0.5, 0.25):
        with torch.no_grad():
            _, _, merged, _, _, _ = net(torch.cat([img0, img1], 1), scale=[4, 2, 1], timestep=t)
        out = ifnet_apply(
            params, to_nhwc(img0), to_nhwc(img1), timestep=t, cfg=IFNetConfig(variant="rife_m")
        )
        diff = np.abs(from_nhwc(out["merged"][2]) - merged[2].numpy()).max()
        assert diff < 2e-4, (t, diff)


def test_ifnet_2r_parity():
    from model.IFNet_2R import IFNet as IFNet2R

    torch.manual_seed(13)
    net = IFNet2R().eval()
    cfg = IFNetConfig(variant="rife", half_res=True)
    params = import_ifnet(_sd_numpy(net), cfg)

    img0, img1 = _rand_pair(h=32, w=32, seed=4)
    with torch.no_grad():
        _, _, merged, _, _, _ = net(torch.cat([img0, img1], 1), scale=[4, 2, 1])
    out = ifnet_apply(params, to_nhwc(img0), to_nhwc(img1), cfg=cfg)
    diff = np.abs(from_nhwc(out["merged"][2]) - merged[2].numpy()).max()
    assert diff < 2e-4, diff


def test_v425_forward_parity():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_ifnet_hdv3", os.path.join(REF, "train_log", "IFNet_HDv3.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    torch.manual_seed(17)
    net = mod.IFNet().eval()
    params = import_v425(_sd_numpy(net))

    img0, img1 = _rand_pair(h=64, w=64, seed=6)
    with torch.no_grad():
        _, _, merged = net(
            torch.cat([img0, img1], 1), timestep=0.5, scale_list=[16, 8, 4, 2, 1]
        )
    out = v425_apply(params, to_nhwc(img0), to_nhwc(img1), timestep=0.5)
    diff = np.abs(from_nhwc(out["merged"][-1]) - merged[-1].numpy()).max()
    assert diff < 2e-4, diff


def test_ifnet_scale_knob_parity():
    """--scale 0.5 (the UHD knob) divides every pyramid level's working
    resolution (reference Model.inference scale_list handling,
    model/RIFE.py:56-58); pin the scale=0.5 graph against torch."""
    from model.IFNet import IFNet

    torch.manual_seed(17)
    net = IFNet().eval()
    params = import_ifnet(_sd_numpy(net))

    # %64-sized input so scale 0.5's coarser pyramid stays integral
    img0, img1 = _rand_pair(h=64, w=128, seed=21)
    with torch.no_grad():
        _, _, merged, _, _, _ = net(torch.cat([img0, img1], 1), scale=[8, 4, 2])
    out = ifnet_apply(params, to_nhwc(img0), to_nhwc(img1),
                      scale_list=(8.0, 4.0, 2.0), cfg=IFNetConfig())
    got = from_nhwc(out["merged"][2])
    assert np.abs(got - merged[2].numpy()).max() < 2e-4


def test_engine_scale_pad_contract():
    """Engine-side: scale changes pad granularity like the reference
    (max(32, 32/scale), inference_video.py:199)."""
    from rife_tpu.engine import InferenceEngine

    assert InferenceEngine("rife", seed=0, scale=0.5).pad_multiple == 64
    assert InferenceEngine("rife", seed=0, scale=1.0).pad_multiple == 32
    assert InferenceEngine("rife", seed=0, scale=2.0).pad_multiple == 32

    eng = InferenceEngine("rife", seed=0, scale=0.5)
    import jax.numpy as jnp

    z0 = jnp.zeros((1, 64, 128, 3), jnp.float32)
    out = eng.interpolate(z0, z0)
    assert out.shape == z0.shape and bool(jnp.isfinite(out).all())


def test_v425_uhd_scale_parity():
    """v4.25 with the UHD knob (scale 0.5 => scale_list [32,16,8,4,2],
    train_log/RIFE_HDv3.py:56-60): pins plane_down_int at f=32 and the
    packed-warp loop when the finest level is s=2."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_ifnet_hdv3_uhd", os.path.join(REF, "train_log", "IFNet_HDv3.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    torch.manual_seed(23)
    net = mod.IFNet().eval()
    params = import_v425(_sd_numpy(net))

    img0, img1 = _rand_pair(h=128, w=128, seed=9)
    with torch.no_grad():
        _, _, merged = net(
            torch.cat([img0, img1], 1), timestep=0.5,
            scale_list=[32, 16, 8, 4, 2]
        )
    out = v425_apply(params, to_nhwc(img0), to_nhwc(img1), timestep=0.5,
                     scale_list=(32.0, 16.0, 8.0, 4.0, 2.0))
    diff = np.abs(from_nhwc(out["merged"][-1]) - merged[-1].numpy()).max()
    assert diff < 2e-4, diff


def test_torch_export_roundtrip_and_reference_load():
    """Export path back to the reference ecosystem: our params ->
    reference state dict -> (a) re-import gives the identical pytree,
    (b) the ACTUAL reference torch IFNet loads it strict=True and its
    forward matches our apply (a checkpoint trained here serves in the
    reference repo unchanged)."""
    import jax

    from model.IFNet import IFNet
    from rife_tpu.models.ifnet import init_ifnet
    from rife_tpu.models.torch_export import export_ifnet

    params = init_ifnet(jax.random.PRNGKey(3), IFNetConfig())
    sd = export_ifnet(params)

    # (a) exact re-import roundtrip
    back = import_ifnet({k: v for k, v in sd.items()})
    flat_a = {k: v for k, v in _flatten_tree(params)}
    flat_b = {k: v for k, v in _flatten_tree(back)}
    assert flat_a.keys() == flat_b.keys()
    for k in flat_a:
        np.testing.assert_array_equal(np.asarray(flat_a[k], np.float32),
                                      np.asarray(flat_b[k], np.float32))

    # (b) the reference model loads it strict and agrees numerically
    net = IFNet().eval()
    missing, unexpected = net.load_state_dict(
        {k: torch.from_numpy(v.copy()) for k, v in sd.items()}, strict=True)
    assert not missing and not unexpected, (missing, unexpected)
    img0, img1 = _rand_pair(h=64, w=64, seed=11)
    with torch.no_grad():
        _, _, merged, _, _, _ = net(torch.cat([img0, img1], 1), scale=[4, 2, 1])
    out = ifnet_apply(params, to_nhwc(img0), to_nhwc(img1))
    diff = np.abs(from_nhwc(out["merged"][2]) - merged[2].numpy()).max()
    assert diff < 2e-4, diff


def _flatten_tree(tree, prefix=""):
    if isinstance(tree, dict):
        for k in sorted(tree):
            yield from _flatten_tree(tree[k], f"{prefix}{k}/")
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from _flatten_tree(v, f"{prefix}{i}/")
    else:
        yield prefix[:-1], np.asarray(tree)
