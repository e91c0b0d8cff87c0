"""Benchmark-harness cross-validation against the reference implementation.

The seven protocols in cli/benchmarks.py were re-implemented from the
reference scripts but (with weights stripped from the checkout) never
validated against a published number.  This closes that hole without
weights: run the REFERENCE torch model with random-init weights through
the REFERENCE protocol (literal transcription of benchmark/Vimeo90K.py's
loop), import the same weights into our engine, run our full CLI on the
same fixture, and require the metrics to agree.  Any protocol drift —
BGR/RGB, rounding, SSIM window, padding — shows up as a PSNR/SSIM gap.

Skipped when /root/reference is absent.
"""
import json
import math
import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference checkout not mounted")

if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)


def _make_fixture(root, n=4, h=256, w=448, seed=5):
    """Vimeo-layout triplet dir with smooth moving-noise frames."""
    import cv2

    rng = np.random.default_rng(seed)
    names = []
    for k in range(n):
        base = rng.random((h + 8, w + 8, 3)).astype(np.float32)
        # box-blur so interpolation is non-trivial but smooth
        for _ in range(2):
            base = (base + np.roll(base, 1, 0) + np.roll(base, 1, 1)
                    + np.roll(base, -1, 0) + np.roll(base, -1, 1)) / 5
        seq = os.path.join(root, "sequences", f"{k:05d}", "0001")
        os.makedirs(seq)
        for i, off in enumerate((0, 2, 4)):
            frame = (base[off:off + h, off:off + w] * 255).astype(np.uint8)
            cv2.imwrite(os.path.join(seq, f"im{i + 1}.png"), frame)
        names.append(f"{k:05d}/0001")
    with open(os.path.join(root, "tri_testlist.txt"), "w") as f:
        f.write("\n".join(names) + "\n")
    return names


def _reference_vimeo_golden(model, root, names):
    """Literal transcription of benchmark/Vimeo90K.py:27-40 (CPU)."""
    import cv2
    import torch

    from model.pytorch_msssim import ssim_matlab

    psnr_list, ssim_list = [], []
    for name in names:
        p = os.path.join(root, "sequences", name)
        I0 = cv2.imread(os.path.join(p, "im1.png"))
        I1 = cv2.imread(os.path.join(p, "im2.png"))
        I2 = cv2.imread(os.path.join(p, "im3.png"))
        I0 = (torch.tensor(I0.transpose(2, 0, 1)) / 255.).unsqueeze(0)
        I2 = (torch.tensor(I2.transpose(2, 0, 1)) / 255.).unsqueeze(0)
        with torch.no_grad():
            mid = model.inference(I0, I2)[0]
        ssim = ssim_matlab(
            torch.tensor(I1.transpose(2, 0, 1)).unsqueeze(0) / 255.,
            torch.round(mid * 255).unsqueeze(0) / 255.).detach().cpu().numpy()
        mid = np.round((mid * 255).detach().cpu().numpy()).astype("uint8").transpose(1, 2, 0) / 255.
        I1 = I1 / 255.
        psnr = -10 * math.log10(((I1 - mid) * (I1 - mid)).mean())
        psnr_list.append(psnr)
        ssim_list.append(float(ssim))
    return float(np.mean(psnr_list)), float(np.mean(ssim_list))


class _RefModel:
    """Model.inference minus the wrapper's torchvision-importing loss
    deps (model/RIFE.py:56-65, TTA=False path)."""

    def __init__(self, seed):
        import torch

        from model.IFNet import IFNet

        torch.manual_seed(seed)
        self.flownet = IFNet().eval()

    def inference(self, img0, img1):
        import torch

        imgs = torch.cat((img0, img1), 1)
        _, _, merged, _, _, _ = self.flownet(imgs, [4, 2, 1])
        return merged[2]


def test_vimeo90k_cli_matches_reference_protocol(tmp_path, capsys):
    import torch

    model = _RefModel(seed=11)

    root = str(tmp_path / "vimeo")
    os.makedirs(root)
    names = _make_fixture(root)

    golden_psnr, golden_ssim = _reference_vimeo_golden(model, root, names)

    # same weights through our importer + full CLI
    ckpt_dir = str(tmp_path / "train_log")
    os.makedirs(ckpt_dir)
    torch.save(model.flownet.state_dict(), os.path.join(ckpt_dir, "flownet.pkl"))

    from rife_tpu.cli.benchmarks import main

    main(["vimeo90k", "--root", root, "--modelDir", ckpt_dir,
          "--dtype", "float32"])
    out = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    res = json.loads(out[-1])
    assert res["benchmark"] == "vimeo90k"
    # full-chain budget: model parity is <2e-4, protocol must add nothing
    assert abs(res["psnr"] - golden_psnr) < 0.05, (res, golden_psnr)
    assert abs(res["ssim"] - golden_ssim) < 1e-3, (res, golden_ssim)


def test_y_psnr_formula_matches_reference(rng):
    """HD benchmark Y-PSNR (benchmark/HD.py:80-83): our rgb_to_y against
    the skimage rgb2yuv Y row the reference uses (matrix hard-coded here
    since skimage isn't in this environment)."""
    from rife_tpu.cli.benchmarks import rgb_to_y

    gt = (rng.random((16, 24, 3)) * 255).astype(np.float64)
    out = (rng.random((16, 24, 3)) * 255).astype(np.uint8)

    def skimage_y(x01):  # skimage.color.rgb2yuv Y coefficients (BT.601)
        return (x01 @ np.array([0.299, 0.587, 0.114])).astype(np.float64)

    diff_rgb = 128.0 + skimage_y(gt / 255.) * 255 - skimage_y(out / 255.) * 255
    mse = np.mean((diff_rgb - 128.0) ** 2)
    golden = 20 * math.log10(255.0 / math.sqrt(mse))

    ours_diff = rgb_to_y(gt / 255.) * 255 - rgb_to_y(out / 255.) * 255
    ours = 20 * math.log10(255.0 / math.sqrt(np.mean(ours_diff ** 2)))
    assert abs(ours - golden) < 1e-9


def test_bf16_serving_psnr_cost(tmp_path, capsys):
    """The bf16 serving path must track the f32 path closely through the
    full Vimeo90K protocol (guards the 'bf16 costs nothing visible'
    serving claim with a measured bound)."""
    import torch

    model = _RefModel(seed=23)
    root = str(tmp_path / "vimeo")
    os.makedirs(root)
    _make_fixture(root, n=2)

    ckpt_dir = str(tmp_path / "train_log")
    os.makedirs(ckpt_dir)
    torch.save(model.flownet.state_dict(), os.path.join(ckpt_dir, "flownet.pkl"))

    from rife_tpu.cli.benchmarks import main

    res = {}
    for dtype in ("float32", "bfloat16"):
        main(["vimeo90k", "--root", root, "--modelDir", ckpt_dir,
              "--dtype", dtype])
        out = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
        res[dtype] = json.loads(out[-1])
    dpsnr = abs(res["float32"]["psnr"] - res["bfloat16"]["psnr"])
    dssim = abs(res["float32"]["ssim"] - res["bfloat16"]["ssim"])
    assert dpsnr < 0.25, (dpsnr, res)
    assert dssim < 0.01, (dssim, res)
