"""Training-path tests: LR schedule, losses, SPMD step on the 8-device
CPU mesh, and a short loss-decrease run — coverage the reference never
had (SURVEY.md §4: DDP paths only exercisable on a real 4-GPU node)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rife_tpu.data import SyntheticTriplets, batch_iterator
from rife_tpu.models.registry import MODEL_REGISTRY
from rife_tpu.parallel import make_mesh, shard_batch, replicated_sharding
from rife_tpu.train import (
    make_eval_step,
    make_train_step,
    sobel_loss,
    ternary_loss,
    train_init,
    warmup_cosine_schedule,
)


def test_lr_schedule_shape():
    sched = warmup_cosine_schedule(10000, world_scale=1.0)
    assert float(sched(0)) == 0.0
    assert abs(float(sched(2000)) - 3e-4) < 1e-8
    assert float(sched(1000)) == pytest.approx(1.5e-4, rel=1e-5)
    assert float(sched(10000)) == pytest.approx(3e-6, rel=1e-3)
    sched4 = warmup_cosine_schedule(10000, world_scale=2.0)
    assert float(sched4(2000)) == pytest.approx(6e-4, rel=1e-6)


def test_aux_losses_basic(rng):
    a = jnp.asarray(rng.random((1, 32, 32, 3), dtype=np.float32))
    b = jnp.asarray(rng.random((1, 32, 32, 3), dtype=np.float32))
    assert float(ternary_loss(a, a)) == pytest.approx(0.0, abs=1e-6)
    assert float(ternary_loss(a, b)) > 0
    assert float(sobel_loss(a, a)) == pytest.approx(0.0, abs=1e-6)
    assert float(sobel_loss(a, b)) > 0


def _tiny_batch(n, hw=32, seed=0):
    r = np.random.default_rng(seed)
    return {
        "img0": r.random((n, hw, hw, 3), np.float32),
        "img1": r.random((n, hw, hw, 3), np.float32),
        "gt": r.random((n, hw, hw, 3), np.float32),
        "timestep": np.full((n,), 0.5, np.float32),
    }


def test_train_step_8dev_mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh(("data",))
    d = MODEL_REGISTRY["rife"]
    state, tx, _ = train_init(d, total_steps=100)
    step = make_train_step(d, tx, mesh=mesh)
    batch = shard_batch(_tiny_batch(8), mesh)
    state = jax.device_put(state, replicated_sharding(mesh))
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1
    # second step reuses the compiled graph
    state, metrics2 = step(state, batch)
    assert int(state.step) == 2
    assert np.isfinite(float(metrics2["loss"]))


def test_eval_step_psnr():
    mesh = make_mesh(("data",))
    d = MODEL_REGISTRY["rife"]
    state, _, _ = train_init(d, total_steps=10)
    ev = make_eval_step(d, mesh=mesh)
    batch = shard_batch(_tiny_batch(8, seed=3), mesh)
    params = jax.device_put(state.params, replicated_sharding(mesh))
    out = ev(params, batch)
    assert out["psnr"].shape == (8,)
    assert np.isfinite(np.asarray(out["psnr"])).all()


def test_loss_decreases_single_device():
    d = MODEL_REGISTRY["rife"]
    state, tx, _ = train_init(d, total_steps=60, peak_lr=1e-4)
    step = make_train_step(d, tx)
    ds = SyntheticTriplets(n=16, h=64, w=64)
    it = batch_iterator(ds, 4, crop=32, epochs=None)
    losses = []
    for i, batch in zip(range(12), it):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-3:]) < np.mean(losses[:3]), losses


def test_train_step_bf16_activations():
    """The --dtype bfloat16 path end-to-end through grad: regression for
    the conv-VJP dtype mismatch (an f32 preferred_element_type on bf16
    conv operands broke value_and_grad; params/optimizer stay f32)."""
    import dataclasses

    from rife_tpu.models.ifnet import IFNetConfig

    d = MODEL_REGISTRY["rife"]
    # Tiny channel widths: the regression is dtype plumbing through
    # value_and_grad, not capacity — keeps the CPU compile to seconds.
    d = dataclasses.replace(
        d, config=IFNetConfig(block_channels=(16, 16, 16), teacher_channels=16))
    state, tx, _ = train_init(d, total_steps=20, peak_lr=1e-4)
    step = make_train_step(d, tx, compute_dtype=jnp.bfloat16)
    ds = SyntheticTriplets(n=8, h=64, w=64)
    it = batch_iterator(ds, 2, crop=32, epochs=None)
    losses = []
    for i, batch in zip(range(2), it):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all(), losses
    assert jax.tree.leaves(state.params)[0].dtype == jnp.float32


def test_synthetic_dataset_and_augmentation():
    ds = SyntheticTriplets(n=8, h=80, w=96)
    batches = batch_iterator(ds, 4, crop=64, epochs=1)
    b = next(iter(batches))
    assert b["img0"].shape == (4, 64, 64, 3)
    assert b["gt"].shape == (4, 64, 64, 3)
    assert 0.0 <= b["img0"].min() and b["img0"].max() <= 1.0
    assert set(b) == {"img0", "img1", "gt", "timestep"}


def test_graft_entry_dryrun():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_v425_training_loss_decreases():
    """v4.25 training support (the reference's own HDv3 update is
    unrunnable -- undefined loss_cons + img0 unbound when training=True;
    we implement the evident intent: L1 + 0.1*sobel smoothness).  Tiny
    channel widths keep the CPU compile fast; crop %64 is the v4.25 pad
    granularity."""
    import dataclasses

    from rife_tpu.models.v425 import V425Config

    d = MODEL_REGISTRY["v4.25"]
    d = dataclasses.replace(d, config=V425Config(block_channels=(16, 16, 16, 16, 16)))
    state, tx, _ = train_init(d, total_steps=40, peak_lr=1e-4,
                              weight_decay=1e-4)
    step = make_train_step(d, tx)
    ds = SyntheticTriplets(n=8, h=72, w=72)
    it = batch_iterator(ds, 2, crop=64, epochs=None)
    losses = []
    for i, batch in zip(range(10), it):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all(), losses
    assert np.mean(losses[-3:]) < np.mean(losses[:3]), losses
