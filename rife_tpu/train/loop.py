"""Data-parallel training step (reference Model.update + train.py loop).

The reference trains with DDP all-reduce over NCCL (model/RIFE.py:29-30,
train.py:145).  Here the whole update — forward with teacher branch,
LapLoss student + teacher + 0.01*distill (model/RIFE.py:76-83), AdamW
wd=1e-3 — is ONE jitted SPMD function over a `data` mesh: params
replicated, batch sharded, gradient psum inserted by XLA over ICI.

bf16 activations with f32 params/optimizer are supported via
`compute_dtype` (the TPU replacement for fp16 AMP).
"""
from __future__ import annotations

import functools
from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from rife_tpu.models.registry import ModelDef
from rife_tpu.ops import lap_loss
from rife_tpu.parallel.mesh import (batch_sharding, replicated_sharding,
                                    superbatch_sharding)
from rife_tpu.train.lr import warmup_cosine_schedule


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray


def train_init(model_def: ModelDef, *, total_steps: int, seed: int = 1234,
               world_scale: float = 1.0, weight_decay: float = 1e-3,
               peak_lr: float = 3e-4, schedule=None):
    """Returns (state, optimizer, schedule).  Default schedule is the
    reference's warmup+cosine; legacy presets pass a cyclic one."""
    if schedule is None:
        schedule = warmup_cosine_schedule(total_steps, peak=peak_lr,
                                          world_scale=world_scale)
    tx = optax.adamw(learning_rate=schedule, weight_decay=weight_decay)
    params = model_def.init(jax.random.PRNGKey(seed), model_def.config)
    state = TrainState(params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32))
    return state, tx, schedule


def _loss_fn_v425(params, batch, model_def: ModelDef, compute_dtype):
    """v4.25 objective: L1 + 0.1 * Sobel flow smoothness.

    The reference's own HDv3 update is unrunnable (train_log/
    RIFE_HDv3.py:62-88: `img0` is only bound when training==False in
    IFNet_HDv3.forward, and `loss_cons` is never defined — though the
    forward initializes it to 0, IFNet_HDv3.py:137).  This implements
    the evident intent: loss_l1 = |merged[-1] - gt| (RIFE_HDv3.py:72),
    loss_smooth = sobel(flow[-1], 0) (RIFE_HDv3.py:73), combined as
    loss_l1 + 0.1*loss_smooth with loss_cons == 0."""
    from rife_tpu.train.losses import sobel_loss

    img0 = batch["img0"].astype(compute_dtype)
    img1 = batch["img1"].astype(compute_dtype)
    gt = batch["gt"].astype(jnp.float32)
    out = model_def.apply(
        params, img0, img1,
        timestep=batch.get("timestep", 0.5),
        scale_list=model_def.scale_list,
        cfg=model_def.config,
    )
    pred = out["merged"][-1].astype(jnp.float32)
    flow = out["flow_list"][-1].astype(jnp.float32)
    loss_l1 = jnp.abs(pred - gt).mean()
    loss_smooth = sobel_loss(flow, jnp.zeros_like(flow))
    loss = loss_l1 + 0.1 * loss_smooth
    metrics = {"loss": loss, "loss_l1": loss_l1, "loss_smooth": loss_smooth}
    mask = jax.nn.sigmoid(out["mask"].astype(jnp.float32))
    vis = {
        "pred": pred, "gt": gt, "merged_tea": pred, "mask": mask,
        "mask_tea": mask, "flow": flow[..., :2], "flow_tea": flow[..., :2],
    }
    return loss, (metrics, vis)


def _loss_fn_legacy(params, batch, model_def: ModelDef, compute_dtype):
    """v1/v2 objective (model/oldmodel/RIFE_HD.py:215-249 /
    RIFE_HDv2.py:200-238): Charbonnier L1 + ternary census, plus
    0.01 * EPE flow consistency against `flow_gt` WHEN the batch
    provides one (the reference's update requires flow_gt
    unconditionally on the training branch, but no shipped dataset
    carries flow ground truth — theirs included, dataset.py returns
    imgs+timestep only — so here the term is gated on availability,
    matching the eval branch's loss_cons = 0 otherwise).

    v1's flow is unidirectional 2ch: the reference compares flow_list[i]
    vs flow_gt[:, :2] and -flow_list[i] vs flow_gt[:, 2:4]
    (RIFE_HD.py:236-238); v2's is bidirectional 4ch, compared slice to
    slice (RIFE_HDv2.py:222-224).  flow_gt here is NHWC 4ch at the
    flownet's half resolution."""
    from rife_tpu.train.losses import epe_loss, ternary_loss

    img0 = batch["img0"].astype(compute_dtype)
    img1 = batch["img1"].astype(compute_dtype)
    gt = batch["gt"].astype(jnp.float32)
    out = model_def.apply(params, img0, img1,
                          scale_list=model_def.scale_list,
                          cfg=model_def.config)
    pred = out["merged"][-1].astype(jnp.float32)
    loss_l1 = jnp.sqrt((pred - gt) ** 2 + 1e-6).mean()
    loss_ter = ternary_loss(pred, gt).mean()
    loss_cons = jnp.zeros((), jnp.float32)
    if "flow_gt" in batch:
        fgt = batch["flow_gt"].astype(jnp.float32)
        ones = jnp.ones_like(fgt[..., :1])
        for f in out["flow_list"]:
            f = f.astype(jnp.float32)
            if f.shape[-1] == 2:  # v1 unidirectional
                loss_cons += epe_loss(f, fgt[..., :2], ones).mean()
                loss_cons += epe_loss(-f, fgt[..., 2:4], ones).mean()
            else:
                loss_cons += epe_loss(f[..., :2], fgt[..., :2], ones).mean()
                loss_cons += epe_loss(f[..., 2:4], fgt[..., 2:4], ones).mean()
        loss_cons = loss_cons * 0.01
    loss = loss_l1 + loss_cons + loss_ter
    metrics = {"loss": loss, "loss_l1": loss_l1, "loss_ter": loss_ter,
               "loss_cons": loss_cons}
    mask = out["mask"].astype(jnp.float32)
    flow = out["flow_list"][-1][..., :2].astype(jnp.float32)
    vis = {"pred": pred, "gt": gt, "merged_tea": pred, "mask": mask,
           "mask_tea": mask, "flow": flow, "flow_tea": flow}
    return loss, (metrics, vis)


def _dev01(batch):
    """Normalize uint8 image batches to [0,1] f32 on device — the u8
    staging path of data.batch_iterator(u8=True) defers the /255 here
    (4x less tunnel traffic per super-batch); bit-identical to the host
    u8_to_f32 values."""
    return {k: (v.astype(jnp.float32) / 255.0 if v.dtype == jnp.uint8 else v)
            for k, v in batch.items()}


def _loss_fn(params, batch, model_def: ModelDef, compute_dtype):
    batch = _dev01(batch)
    if model_def.name == "v4.25":
        return _loss_fn_v425(params, batch, model_def, compute_dtype)
    if model_def.name in ("hd", "hdv2"):
        return _loss_fn_legacy(params, batch, model_def, compute_dtype)
    img0 = batch["img0"].astype(compute_dtype)
    img1 = batch["img1"].astype(compute_dtype)
    gt = batch["gt"].astype(compute_dtype)
    out = model_def.apply(
        params, img0, img1,
        timestep=batch.get("timestep", 0.5),
        scale_list=model_def.scale_list,
        gt=gt,
        cfg=model_def.config,
    )
    pred = out["merged"][-1].astype(jnp.float32)
    gt32 = gt.astype(jnp.float32)
    loss_l1 = lap_loss(pred, gt32)
    loss_tea = lap_loss(out["merged_teacher"].astype(jnp.float32), gt32)
    loss_distill = out["loss_distill"].astype(jnp.float32)
    loss = loss_l1 + loss_tea + 0.01 * loss_distill
    metrics = {
        "loss": loss,
        "loss_l1": loss_l1,
        "loss_tea": loss_tea,
        "loss_distill": loss_distill,
    }
    # Observability tensors for the 1000-step image panels (reference
    # train.py:75-87 / Model.update info dict, model/RIFE.py:86-95).
    # Device-resident until the host fetches them on a panel step.
    vis = {
        "pred": pred,
        "gt": gt32,
        "merged_tea": out["merged_teacher"].astype(jnp.float32),
        "mask": out["mask_list"][-1].astype(jnp.float32),
        "mask_tea": out["mask_list"][-1].astype(jnp.float32),
        "flow": out["flow_list"][-1][..., :2].astype(jnp.float32),
        "flow_tea": out["flow_teacher"].astype(jnp.float32),
    }
    return loss, (metrics, vis)


def make_train_step(model_def: ModelDef, tx, mesh=None, compute_dtype=jnp.float32,
                    with_vis: bool = False):
    """Build the jitted SPMD train step.  With a mesh, inputs/outputs are
    explicitly annotated: state replicated, batch sharded on `data`.
    with_vis additionally returns the panel tensors (pred/gt/teacher/
    mask/flow), batch-sharded — fetch them only on logging steps."""

    def step_fn(state: TrainState, batch):
        grad_fn = jax.value_and_grad(_loss_fn, has_aux=True)
        (_, (metrics, vis)), grads = grad_fn(state.params, batch, model_def, compute_dtype)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=new_params, opt_state=new_opt, step=state.step + 1)
        if with_vis:
            return new_state, metrics, vis
        return new_state, metrics

    if mesh is None:
        return jax.jit(step_fn)
    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh)
    out_shardings = (repl, repl, data) if with_vis else (repl, repl)
    return jax.jit(
        step_fn,
        in_shardings=(repl, data),
        out_shardings=out_shardings,
    )


def make_train_step_chained(model_def: ModelDef, tx, k: int, mesh=None,
                            compute_dtype=jnp.float32, with_vis: bool = False):
    """K optimizer steps inside ONE jit over a (K, batch, ...) staged
    super-batch — the training analog of bench.py's chained loop: every
    jit INVOCATION over a tunneled runtime costs ~0.7 s of dispatch
    (CLAUDE.md), which dominated the r4 run (t_train 2.4-5.8 s against
    a 124 ms device step).  lax.scan runs the first k-1 steps (metrics
    only), the k-th runs unrolled so its panel tensors are emitted
    without stacking K full vis pytrees.  Metrics come back stacked
    (k,) per key; vis is the LAST sub-step's.

    The loss trajectory is the same computation as k calls of
    make_train_step on the same batches (asserted on CPU by
    tests/test_train.py::test_chained_train_step_matches_single)."""
    assert k >= 1

    def one(state: TrainState, batch):
        grad_fn = jax.value_and_grad(_loss_fn, has_aux=True)
        (_, (metrics, vis)), grads = grad_fn(state.params, batch, model_def,
                                             compute_dtype)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (TrainState(params=new_params, opt_state=new_opt,
                           step=state.step + 1), metrics, vis)

    def chain_fn(state: TrainState, superbatch):
        if k > 1:
            head = jax.tree.map(lambda x: x[:-1], superbatch)

            def body(st, batch):
                st2, metrics, _ = one(st, batch)
                return st2, metrics

            state, ms_head = jax.lax.scan(body, state, head)
        tail = jax.tree.map(lambda x: x[-1], superbatch)
        state, m_last, vis = one(state, tail)
        if k > 1:
            metrics = jax.tree.map(
                lambda a, b: jnp.concatenate([a, b[None]]), ms_head,
                jax.tree.map(jnp.asarray, m_last))
        else:
            metrics = jax.tree.map(lambda x: jnp.asarray(x)[None], m_last)
        if with_vis:
            return state, metrics, vis
        return state, metrics

    if mesh is None:
        return jax.jit(chain_fn)
    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh)
    super_data = superbatch_sharding(mesh)
    out_shardings = (repl, repl, data) if with_vis else (repl, repl)
    return jax.jit(chain_fn, in_shardings=(repl, super_data),
                   out_shardings=out_shardings)


def make_eval_step(model_def: ModelDef, mesh=None, compute_dtype=jnp.float32):
    """Validation: PSNR of student and teacher vs gt (train.py:97-136)."""

    def eval_fn(params, batch):
        batch = _dev01(batch)
        img0 = batch["img0"].astype(compute_dtype)
        img1 = batch["img1"].astype(compute_dtype)
        gt = batch["gt"].astype(jnp.float32)
        # only the student/teacher family takes a gt kwarg (distill
        # branch); v4.25 and the legacy presets do not
        kw = {"gt": gt.astype(compute_dtype)} \
            if model_def.name in ("rife", "rife_m", "rife_2r") else {}
        out = model_def.apply(
            params, img0, img1,
            timestep=batch.get("timestep", 0.5),
            scale_list=model_def.scale_list,
            cfg=model_def.config,
            **kw,
        )
        pred = out["merged"][-1].astype(jnp.float32)
        # teacherless presets (v4.25) report the student twice
        tea = out.get("merged_teacher", out["merged"][-1]).astype(jnp.float32)

        def psnr(a, b):
            mse = jnp.mean((a - b) ** 2, axis=(1, 2, 3))
            return -10.0 * jnp.log10(mse + 1e-12)

        return {"psnr": psnr(pred, gt), "psnr_tea": psnr(tea, gt), "pred": pred}

    if mesh is None:
        return jax.jit(eval_fn)
    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh)
    return jax.jit(eval_fn, in_shardings=(repl, data), out_shardings=data)
