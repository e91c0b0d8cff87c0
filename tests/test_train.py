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
    # Fixed LR rather than train_init's warmup schedule: 12 steps into a
    # 2000-step warmup the LR is ~1e-7 and any "decrease" is augment
    # noise (flaked when the augment RNG stream changed in round 4).
    import optax

    from rife_tpu.train.loop import TrainState

    d = MODEL_REGISTRY["rife"]
    tx = optax.adamw(2e-4, weight_decay=1e-3)
    params = d.init(jax.random.PRNGKey(0), d.config)
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))
    step = make_train_step(d, tx)
    ds = SyntheticTriplets(n=16, h=64, w=64)
    it = batch_iterator(ds, 4, crop=32, epochs=None)
    losses = []
    for i, batch in zip(range(30), it):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert np.min(losses[5:]) < np.mean(losses[:3]), losses


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


class _SlowTriplets(SyntheticTriplets):
    """Loader fake whose per-item decode takes `delay` seconds (stands in
    for cv2.imread of 3 PNGs, which releases the GIL the same way
    time.sleep does)."""

    def __init__(self, delay: float, **kw):
        super().__init__(**kw)
        self.delay = delay

    def load(self, index):
        import time

        time.sleep(self.delay)
        return super().load(index)


def test_u8_staging_matches_f32_path():
    """batch_iterator(u8=True) + the jitted /255 (train/loop._dev01)
    must reproduce the host-converted f32 batches exactly, and the
    train step must accept uint8 batches (the cli/train staging path
    on tunneled runtimes)."""
    ds = SyntheticTriplets(n=8, h=64, w=64)
    bf = next(iter(batch_iterator(ds, 4, crop=64)))
    bu = next(iter(batch_iterator(ds, 4, crop=64, u8=True)))
    for k in ("img0", "img1", "gt"):
        assert bu[k].dtype == np.uint8
        # native u8_to_f32 multiplies by (1/255.f); /255.0 divides —
        # same value to the last ulp or two
        np.testing.assert_allclose(
            bf[k], bu[k].astype(np.float32) / 255.0, atol=3e-7, rtol=0)
    d = MODEL_REGISTRY["rife"]
    state, tx, _ = train_init(d, total_steps=10)
    step = make_train_step(d, tx)
    _, m_f = step(state, bf)
    _, m_u = step(state, bu)
    assert float(m_f["loss"]) == pytest.approx(float(m_u["loss"]), rel=1e-5)


def test_input_pipeline_determinism_across_workers():
    """The sample stream must be identical for every (workers, prefetch)
    setting — per-(epoch, slot) augment RNGs, not a shared sequential
    stream."""
    ds = SyntheticTriplets(n=16, h=48, w=48)
    grab = lambda **kw: [
        b for _, b in zip(range(3), batch_iterator(ds, 4, crop=32, **kw))]
    ref = grab()
    for kw in (dict(workers=4), dict(prefetch=2), dict(workers=4, prefetch=2)):
        got = grab(**kw)
        for rb, gb in zip(ref, got):
            for k in ("img0", "img1", "gt", "timestep"):
                np.testing.assert_array_equal(rb[k], gb[k], err_msg=str(kw))


def test_input_pipeline_overlaps_device_step():
    """VERDICT r3 next #3 'done' criterion: with the async pipeline, time
    blocked on the iterator (t_data) stays under 10% of the step time
    even when raw decode costs MORE than a step (8 workers + depth-2
    prefetch hide a 4*3*20 ms serial decode behind a 100 ms step)."""
    import time

    delay, step_time, batch = 0.02, 0.1, 4
    ds = _SlowTriplets(delay, n=64, h=48, w=48)
    it = batch_iterator(ds, batch, crop=32, workers=8, prefetch=2,
                        epochs=None)
    t_data = []
    t0 = time.perf_counter()
    for k, _ in enumerate(it):
        t_data.append(time.perf_counter() - t0)
        time.sleep(step_time)  # stand-in for the jitted device step
        if k == 9:
            break
        t0 = time.perf_counter()
    it.close()
    steady = t_data[2:]  # let the double buffer fill
    assert np.median(steady) < 0.1 * step_time, t_data
    # sanity: the synchronous pipeline would pay the decode serially
    sync = batch_iterator(ds, batch, crop=32, epochs=None)
    t0 = time.perf_counter()
    next(iter(sync))
    assert time.perf_counter() - t0 > 0.5 * batch * delay


def test_septuplet_fractional_t_stream():
    """--septuplet yields genuinely varied fractional timesteps (the
    reference's commented RIFEm sampler, dataset.py:59-68): t =
    (i1-i0)/(i2-i0) over 3-of-7 sorted picks, time-swap aug mapping
    t -> 1-t."""
    from rife_tpu.data import SyntheticSeptuplets

    ds = SyntheticSeptuplets(n=16, h=48, w=48)
    ts = []
    for b in zip(range(8), batch_iterator(ds, 4, crop=32, epochs=None)):
        ts.extend(np.asarray(b[1]["timestep"]).tolist())
    ts = np.asarray(ts)
    assert ts.min() >= 0.0 and ts.max() <= 1.0
    assert len(np.unique(np.round(ts, 3))) > 3, ts  # not locked to 0.5
    assert np.any(np.abs(ts - 0.5) > 0.1), ts


def test_vimeo_septuplets_fixture(tmp_path):
    import cv2

    root = tmp_path / "vimeo_septuplet"
    seqdir = root / "sequences" / "00001" / "0001"
    seqdir.mkdir(parents=True)
    r = np.random.default_rng(0)
    for i in range(1, 8):
        cv2.imwrite(str(seqdir / f"im{i}.png"),
                    r.integers(0, 255, (64, 64, 3), dtype=np.uint8))
    (root / "sep_trainlist.txt").write_text("00001/0001\n" * 4)
    from rife_tpu.data import VimeoSeptuplets

    ds = VimeoSeptuplets(str(root), "train")
    img0, gt, img1, t = ds.load(0)
    assert img0.shape == (64, 64, 3) and 0.0 <= t <= 1.0
    # resampled per visit (mirrors the reference's per-epoch shuffle)
    ts = {round(ds.load(0)[3], 4) for _ in range(12)}
    assert len(ts) > 1, ts


def test_rife_m_fractional_t_training_and_t_sensitivity():
    """VERDICT r3 next #5 'done' criteria: rife_m loss decreases when
    trained with varied t, and the timestep plane changes the output
    (t=0.25 vs t=0.75 differ)."""
    import optax

    from rife_tpu.data import SyntheticSeptuplets
    from rife_tpu.engine import InferenceEngine
    from rife_tpu.train.loop import TrainState

    d = MODEL_REGISTRY["rife_m"]
    tx = optax.adamw(2e-4, weight_decay=1e-3)
    params = d.init(jax.random.PRNGKey(0), d.config)
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))
    step = make_train_step(d, tx)
    ds = SyntheticSeptuplets(n=32, h=48, w=48)
    losses, ts_seen = [], []
    for i, batch in zip(range(60), batch_iterator(ds, 4, crop=32, epochs=None)):
        ts_seen.extend(np.asarray(batch["timestep"]).tolist())
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert np.any(np.abs(np.asarray(ts_seen) - 0.5) > 0.1)  # t actually varied
    assert np.min(losses[10:]) < np.mean(losses[:5]), losses[:10]

    eng = InferenceEngine("rife_m", params=state.params)
    val = SyntheticSeptuplets(n=2, h=64, w=64, seed=9)
    i0, _, i1, _ = val.load(0)
    a = jnp.asarray(i0[None].astype(np.float32) / 255)
    b = jnp.asarray(i1[None].astype(np.float32) / 255)
    o25 = np.asarray(eng.interpolate(a, b, timestep=0.25))
    o75 = np.asarray(eng.interpolate(a, b, timestep=0.75))
    assert float(np.abs(o25 - o75).mean()) > 1e-4, "timestep plane inert"


def test_cyclic_lr_schedule():
    from rife_tpu.train import cyclic_lr_schedule

    s = cyclic_lr_schedule()  # base 1e-6, peak 1e-3, 8000 up
    assert float(s(0)) == pytest.approx(1e-6, rel=1e-6)
    assert float(s(8000)) == pytest.approx(1e-3, rel=1e-6)
    assert float(s(16000)) == pytest.approx(1e-6, rel=1e-3)
    assert float(s(4000)) == pytest.approx((1e-6 + 1e-3) / 2, rel=1e-3)


@pytest.mark.parametrize("model", ["hd", "hdv2"])
def test_legacy_training_loss_decreases(model):
    """VERDICT r3 next #7: the v1/v2 presets train with the reference
    objective (Charbonnier + ternary census, oldmodel/RIFE_HD.py:215-249)
    — no longer inference-compat only."""
    import optax

    from rife_tpu.train.loop import TrainState

    d = MODEL_REGISTRY[model]
    tx = optax.adamw(2e-4, weight_decay=1e-4)
    params = d.init(jax.random.PRNGKey(0), d.config)
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))
    step = make_train_step(d, tx)
    ds = SyntheticTriplets(n=32, h=72, w=72)
    losses = []
    for i, batch in zip(range(40), batch_iterator(ds, 2, crop=64, epochs=None)):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
        assert float(m["loss_cons"]) == 0.0  # no flow_gt in the batch
    assert np.min(losses[5:]) < np.mean(losses[:5]), losses[:10]


def test_legacy_flow_consistency_term():
    """With a flow_gt in the batch the 0.01*EPE consistency term
    activates over every block's accumulated flow (RIFE_HD.py:236-239 /
    RIFE_HDv2.py:221-224) and is differentiable."""
    import optax

    from rife_tpu.train.loop import TrainState, make_train_step

    for model, fgt_ch in (("hd", 4), ("hdv2", 4)):
        d = MODEL_REGISTRY[model]
        tx = optax.adamw(1e-4, weight_decay=1e-4)
        params = d.init(jax.random.PRNGKey(1), d.config)
        state = TrainState(params=params, opt_state=tx.init(params),
                           step=jnp.zeros((), jnp.int32))
        step = make_train_step(d, tx)
        r = np.random.default_rng(0)
        n, hw = 2, 64
        batch = {
            "img0": r.random((n, hw, hw, 3), np.float32),
            "img1": r.random((n, hw, hw, 3), np.float32),
            "gt": r.random((n, hw, hw, 3), np.float32),
            "timestep": np.full((n,), 0.5, np.float32),
            # legacy flownets emit flow at 1/2 input resolution
            "flow_gt": r.standard_normal((n, hw // 2, hw // 2, fgt_ch)).astype(np.float32),
        }
        state, m = step(state, batch)
        assert float(m["loss_cons"]) > 0.0, model
        assert np.isfinite(float(m["loss"])), model


def test_chained_train_step_matches_single():
    """K steps inside one jit (make_train_step_chained, lax.scan over a
    staged super-batch) must produce the same loss trajectory and final
    params as K calls of make_train_step on the same batches (round-4
    VERDICT next #5 — the dispatch-amortization path must not change
    the optimization)."""
    from rife_tpu.parallel import shard_superbatch
    from rife_tpu.train import make_train_step_chained

    mesh = make_mesh(("data",))
    d = MODEL_REGISTRY["rife"]
    k = 4
    batches = [_tiny_batch(8, seed=10 + i) for i in range(k)]

    state0, tx, _ = train_init(d, total_steps=100)
    state0 = jax.device_put(state0, replicated_sharding(mesh))

    step1 = make_train_step(d, tx, mesh=mesh)
    st = state0
    losses_single = []
    for b in batches:
        st, m = step1(st, shard_batch(b, mesh))
        losses_single.append(float(m["loss"]))

    chained = make_train_step_chained(d, tx, k, mesh=mesh)
    superbatch = {key: np.stack([b[key] for b in batches])
                  for key in batches[0]}
    st_c, metrics = chained(state0, shard_superbatch(superbatch, mesh))

    losses_chained = [float(v) for v in metrics["loss"]]
    assert int(st_c.step) == k
    np.testing.assert_allclose(losses_chained, losses_single,
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(st.params), jax.tree.leaves(st_c.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)


def test_chained_train_step_with_vis_last_substep():
    """with_vis returns the LAST sub-step's panel tensors, batch-sharded,
    and metrics stacked (k,)."""
    from rife_tpu.parallel import shard_superbatch
    from rife_tpu.train import make_train_step_chained

    mesh = make_mesh(("data",))
    d = MODEL_REGISTRY["rife"]
    k = 2
    batches = [_tiny_batch(8, seed=20 + i) for i in range(k)]
    state0, tx, _ = train_init(d, total_steps=100)
    state0 = jax.device_put(state0, replicated_sharding(mesh))

    chained = make_train_step_chained(d, tx, k, mesh=mesh, with_vis=True)
    superbatch = {key: np.stack([b[key] for b in batches])
                  for key in batches[0]}
    st, metrics, vis = chained(state0, shard_superbatch(superbatch, mesh))
    assert metrics["loss"].shape == (k,)
    assert vis["pred"].shape == (8, 32, 32, 3)
    # vis is the k-th sub-step's: its gt equals the LAST staged batch's
    np.testing.assert_allclose(np.asarray(vis["gt"]), batches[-1]["gt"],
                               rtol=0, atol=1e-6)


def test_septuplet_pipeline_determinism_across_workers():
    """round-4 ADVICE #2: the septuplet frame-pick RNG must be
    scheduling-independent — identical stream for every (workers,
    prefetch) setting, and DIFFERENT picks across epochs for the same
    index (the picks must still resample per visit)."""
    from rife_tpu.data import SyntheticSeptuplets

    ds = SyntheticSeptuplets(n=16, h=48, w=48)
    grab = lambda **kw: [
        b for _, b in zip(range(8), batch_iterator(ds, 4, crop=32, **kw))]
    ref = grab()
    for kw in (dict(workers=4), dict(prefetch=2), dict(workers=4, prefetch=2)):
        got = grab(**kw)
        for rb, gb in zip(ref, got):
            for k in ("img0", "img1", "gt", "timestep"):
                np.testing.assert_array_equal(rb[k], gb[k], err_msg=str(kw))
    # 8 batches of 4 from n=16 = 2 epochs; the pick stream must vary
    # across epochs (same indices, different (epoch, slot) keys)
    t_epoch0 = np.concatenate([b["timestep"] for b in ref[:4]])
    t_epoch1 = np.concatenate([b["timestep"] for b in ref[4:]])
    assert not np.array_equal(np.sort(t_epoch0), np.sort(t_epoch1))


def test_septuplet_validation_pick_reproducible():
    """Validation picks are fixed per index: two passes over the val
    split yield identical samples (reproducible val PSNR)."""
    from rife_tpu.data import SyntheticSeptuplets

    ds = SyntheticSeptuplets(n=8, h=48, w=48)
    ds.split = "validation"
    a = [b for b in batch_iterator(ds, 4, augment=False, epochs=1)]
    b = [b for b in batch_iterator(ds, 4, augment=False, epochs=1)]
    for ba, bb in zip(a, b):
        for k in ("img0", "img1", "gt", "timestep"):
            np.testing.assert_array_equal(ba[k], bb[k])


def test_prefetch_iterator_terminal_after_exception_and_close():
    """round-4 ADVICE #3: after delivering a generator exception the
    iterator raises StopIteration (not a forever-block) on further
    next(); close() also closes the wrapped generator."""
    from rife_tpu.data.vimeo import _PrefetchIterator

    def boom():
        yield 1
        raise RuntimeError("loader failed")

    it = _PrefetchIterator(boom(), depth=2)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="loader failed"):
        for _ in range(10):
            next(it)
    with pytest.raises(StopIteration):
        next(it)

    closed = []

    def tracked():
        try:
            while True:
                yield 0
        finally:
            closed.append(True)

    it2 = _PrefetchIterator(tracked(), depth=1)
    assert next(it2) == 0
    it2.close()
    assert closed == [True]
    with pytest.raises(StopIteration):
        next(it2)
