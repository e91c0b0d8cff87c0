"""Legacy HDv2 model parity vs the reference torch implementation."""
import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference checkout not mounted")

if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)

import sys as _sys  # noqa: E402
import types  # noqa: E402

# The reference's loss.py imports torchvision (absent here) only to
# define the (unused at init) VGG perceptual loss — stub it out.
if "torchvision" not in _sys.modules:
    tv = types.ModuleType("torchvision")
    tv.models = types.ModuleType("torchvision.models")
    _sys.modules["torchvision"] = tv
    _sys.modules["torchvision.models"] = tv.models

import torch  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rife_tpu.models.legacy import hdv2_apply  # noqa: E402
from rife_tpu.models.torch_import import import_hdv2  # noqa: E402


def to_nhwc(t):
    return jnp.asarray(np.moveaxis(t.detach().numpy(), 1, -1))


def test_hdv2_inference_parity():
    from model.oldmodel.RIFE_HDv2 import Model

    torch.manual_seed(21)
    m = Model(local_rank=-1)
    m.eval()

    sd = {}
    for prefix, net in (("flownet", m.flownet), ("contextnet", m.contextnet),
                        ("fusionnet", m.fusionnet)):
        sd.update({f"{prefix}.{k}": v.detach().numpy()
                   for k, v in net.state_dict().items()})
    params = import_hdv2(sd)

    g = torch.Generator().manual_seed(4)
    img0 = torch.rand(1, 3, 64, 64, generator=g)
    img1 = torch.rand(1, 3, 64, 64, generator=g)
    with torch.no_grad():
        ref = m.inference(img0, img1)
    out = hdv2_apply(params, to_nhwc(img0), to_nhwc(img1))
    got = np.moveaxis(np.asarray(out["merged"][-1]), -1, 1)
    diff = np.abs(got - ref.numpy()).max()
    assert diff < 5e-4, diff


def test_hd_v1_inference_parity():
    from model.oldmodel.RIFE_HD import Model

    from rife_tpu.models.legacy import hd_apply
    from rife_tpu.models.torch_import import import_hd

    torch.manual_seed(31)
    m = Model(local_rank=-1)
    # Give BN non-trivial running stats so the fold is actually exercised.
    for mod in m.flownet.modules():
        if isinstance(mod, torch.nn.BatchNorm2d):
            mod.running_mean.uniform_(-0.2, 0.2)
            mod.running_var.uniform_(0.5, 1.5)
    m.eval()

    sd = {}
    for prefix, net in (("flownet", m.flownet), ("contextnet", m.contextnet),
                        ("fusionnet", m.fusionnet)):
        sd.update({f"{prefix}.{k}": v.detach().numpy()
                   for k, v in net.state_dict().items()})
    params = import_hd(sd)

    g = torch.Generator().manual_seed(7)
    img0 = torch.rand(1, 3, 64, 64, generator=g)
    img1 = torch.rand(1, 3, 64, 64, generator=g)
    with torch.no_grad():
        ref = m.inference(img0, img1)
    out = hd_apply(params, to_nhwc(img0), to_nhwc(img1))
    got = np.moveaxis(np.asarray(out["merged"][-1]), -1, 1)
    diff = np.abs(got - ref.numpy()).max()
    assert diff < 5e-4, diff


def test_hd_v1_checkpoint_dir_loading(tmp_path):
    from model.oldmodel.RIFE_HD import Model

    from rife_tpu.engine import load_checkpoint

    torch.manual_seed(6)
    m = Model(local_rank=-1)
    torch.save(m.flownet.state_dict(), str(tmp_path / "flownet.pkl"))
    torch.save(m.contextnet.state_dict(), str(tmp_path / "contextnet.pkl"))
    torch.save(m.fusionnet.state_dict(), str(tmp_path / "unet.pkl"))
    name, params = load_checkpoint(str(tmp_path))
    assert name == "hd"
    assert "fusionnet" in params and "res5" in params["block0"]


def test_hdv2_checkpoint_dir_loading(tmp_path):
    from model.oldmodel.RIFE_HDv2 import Model

    from rife_tpu.engine import load_checkpoint

    torch.manual_seed(5)
    m = Model(local_rank=-1)
    torch.save(m.flownet.state_dict(), str(tmp_path / "flownet.pkl"))
    torch.save(m.contextnet.state_dict(), str(tmp_path / "contextnet.pkl"))
    torch.save(m.fusionnet.state_dict(), str(tmp_path / "unet.pkl"))
    name, params = load_checkpoint(str(tmp_path))
    assert name == "hdv2"
    assert "fusionnet" in params
