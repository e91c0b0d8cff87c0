"""Image-panel observability tests (reference train.py:29-37,75-87)."""
import os

import numpy as np

from rife_tpu.utils.logging import MetricLogger
from rife_tpu.utils.viz import build_panels, dump_panels, flow_to_rgb


def _ref_flow2rgb(flow_map_np):
    # Literal reimplementation of the reference formula (train.py:29-37)
    # as the golden for ours.
    h, w, _ = flow_map_np.shape
    rgb_map = np.ones((h, w, 3)).astype(np.float32)
    normalized = flow_map_np / (np.abs(flow_map_np).max())
    rgb_map[:, :, 0] += normalized[:, :, 0]
    rgb_map[:, :, 1] -= 0.5 * (normalized[:, :, 0] + normalized[:, :, 1])
    rgb_map[:, :, 2] += normalized[:, :, 1]
    return rgb_map.clip(0, 1)


def test_flow_to_rgb_matches_reference_formula(rng):
    flow = rng.standard_normal((16, 24, 2)).astype(np.float32) * 3
    np.testing.assert_allclose(flow_to_rgb(flow), _ref_flow2rgb(flow), atol=1e-6)


def test_flow_to_rgb_zero_flow_is_white():
    out = flow_to_rgb(np.zeros((4, 4, 2), np.float32))
    assert out.min() == out.max() == 1.0


def _vis(n=6, h=16, w=16, seed=0):
    r = np.random.default_rng(seed)
    return {
        "pred": r.random((n, h, w, 3), np.float32),
        "gt": r.random((n, h, w, 3), np.float32),
        "merged_tea": r.random((n, h, w, 3), np.float32),
        "mask": r.random((n, h, w, 1), np.float32),
        "mask_tea": r.random((n, h, w, 1), np.float32),
        "flow": r.standard_normal((n, h, w, 2)).astype(np.float32),
        "flow_tea": r.standard_normal((n, h, w, 4)).astype(np.float32),
    }


def test_build_panels_shapes():
    panels = build_panels(_vis(), n=5)
    assert set(panels) == {f"{i}/{k}" for i in range(5)
                           for k in ("img", "flow", "mask")}
    assert panels["0/img"].shape == (16, 48, 3)      # tea|pred|gt
    assert panels["0/flow"].shape == (16, 32, 3)     # student|teacher
    assert panels["0/mask"].shape == (16, 32, 3)
    assert all(p.dtype == np.uint8 for p in panels.values())


def test_dump_panels_writes_pngs(tmp_path):
    logger = MetricLogger(str(tmp_path))
    paths = dump_panels(logger, 1000, _vis(n=2), n=2)
    logger.close()
    assert len(paths) == 6
    for p in paths:
        assert p.endswith(".png")
        assert np.asarray(__import__("PIL.Image", fromlist=["open"]).open(p)).ndim == 3


def test_train_step_with_vis():
    import jax

    from rife_tpu.models.registry import MODEL_REGISTRY
    from rife_tpu.parallel import make_mesh, replicated_sharding, shard_batch
    from rife_tpu.train import make_train_step, train_init

    mesh = make_mesh(("data",))
    d = MODEL_REGISTRY["rife"]
    state, tx, _ = train_init(d, total_steps=10)
    step = make_train_step(d, tx, mesh=mesh, with_vis=True)
    r = np.random.default_rng(0)
    batch = shard_batch({
        "img0": r.random((8, 32, 32, 3), np.float32),
        "img1": r.random((8, 32, 32, 3), np.float32),
        "gt": r.random((8, 32, 32, 3), np.float32),
        "timestep": np.full((8,), 0.5, np.float32),
    }, mesh)
    state = jax.device_put(state, replicated_sharding(mesh))
    state, metrics, vis = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert vis["pred"].shape == (8, 32, 32, 3)
    assert vis["mask"].shape == (8, 32, 32, 1)
    assert vis["flow"].shape == (8, 32, 32, 2)
    panels = build_panels(jax.device_get(vis), n=2)
    assert panels["0/img"].shape == (32, 96, 3)


def test_train_cli_smoke_with_panels(tmp_path):
    """End-to-end training CLI: synthetic data, panels + val + checkpoint."""
    import glob

    from rife_tpu.cli.train import main

    log_dir = str(tmp_path / "log")
    main(["--synthetic", "--steps", "2", "--batch_size", "8", "--crop", "32",
          "--log_dir", log_dir, "--vis_interval", "2", "--val_batches", "1"])
    # panel PNGs dumped at steps 1 and 2 (vis_interval=2 plus step==1)
    pngs = glob.glob(os.path.join(log_dir, "panels", "*", "*.png"))
    assert len(pngs) >= 6
    assert os.path.exists(os.path.join(log_dir, "metrics.jsonl"))
