"""Training CLI (reference train.py:39-155).

    python -m rife_tpu.cli.train --data vimeo_triplet --epoch 300 --batch_size 16
    python -m rife_tpu.cli.train --synthetic --steps 50        # smoke run

Differences from the reference launch: no torch.distributed.launch —
multi-host TPU runs call jax.distributed.initialize and every host runs
the same script (SPMD); the data mesh covers all global devices and the
per-host input pipeline feeds its process shard (replaces
DistributedSampler).  LR = warmup+cosine scaled by total-batch/64 like
the reference's world_size/4 scaling of batch-16 workers (train.py:66).

Logs scalars every 200 steps and validation PSNR every 5 epochs
(train.py:70-93) to TensorBoard when available, always to a JSONL file.
Checkpoints (params + optimizer + step, resumable) every epoch.
"""
from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

import jax

from rife_tpu.data import (
    SyntheticSeptuplets,
    SyntheticTriplets,
    VimeoSeptuplets,
    VimeoTriplets,
    batch_iterator,
)
from rife_tpu.engine.checkpoint import load_params, save_params
from rife_tpu.models.registry import MODEL_REGISTRY
from rife_tpu.parallel import make_mesh, shard_batch, replicated_sharding
from rife_tpu.train import TrainState, make_eval_step, make_train_step, train_init
from rife_tpu.utils.logging import MetricLogger


def main(argv=None):
    from rife_tpu.cli._common import enable_compilation_cache

    enable_compilation_cache()

    ap = argparse.ArgumentParser()
    ap.add_argument("--epoch", type=int, default=300)
    ap.add_argument("--batch_size", type=int, default=16, help="global batch size")
    ap.add_argument("--data", type=str, default="vimeo_triplet")
    ap.add_argument("--synthetic", action="store_true", help="train on synthetic data (smoke)")
    ap.add_argument("--synthetic_n", type=int, default=None,
                    help="synthetic dataset size (default 4*batch, min 64; "
                         "sets the epoch length and thus checkpoint cadence)")
    ap.add_argument("--septuplet", action="store_true",
                    help="fractional-timestep training on Vimeo septuplets "
                         "(3 of 7 frames, t=(i1-i0)/(i2-i0); the reference's "
                         "commented-out RIFEm path, dataset.py:59-68). "
                         "--data should point at vimeo_septuplet")
    ap.add_argument("--steps", type=int, default=None, help="stop after N steps (smoke)")
    ap.add_argument("--model", type=str, default="rife",
                    choices=["rife", "rife_m", "rife_2r", "v4.25", "hd", "hdv2"])
    ap.add_argument("--weight_decay", type=float, default=None,
                    help="AdamW wd (default 1e-3 paper / 1e-4 v4.25, "
                         "model/RIFE.py:25, train_log/RIFE_HDv3.py:19)")
    ap.add_argument("--crop", type=int, default=224)
    ap.add_argument("--log_dir", type=str, default="train_log")
    ap.add_argument("--resume", type=str, default=None)
    ap.add_argument("--seed", type=int, default=1234)
    ap.add_argument("--workers", type=int, default=8,
                    help="loader threads per batch (reference: 8 DataLoader "
                         "workers, train.py:49-50); 0 = inline")
    ap.add_argument("--prefetch", type=int, default=2,
                    help="batches assembled ahead on a background thread "
                         "(0 = synchronous)")
    ap.add_argument("--dtype", type=str, default="float32", choices=["float32", "bfloat16"])
    ap.add_argument("--steps_per_call", type=int, default=1,
                    help="optimizer steps chained inside ONE jit call "
                         "(lax.scan over a K-step staged super-batch). "
                         "Amortizes per-invocation dispatch (~0.7 s on "
                         "tunneled runtimes) exactly like bench.py's "
                         "chained loop; loss trajectory is identical to "
                         "K=1 (tests/test_train.py). Scalar logs keep "
                         "their cadence; image panels snap to the last "
                         "sub-step of the window that crosses it")
    ap.add_argument("--vis_interval", type=int, default=1000,
                    help="image-panel cadence in steps (0 disables; ref train.py:75)")
    ap.add_argument("--val_interval", type=int, default=5,
                    help="validation cadence in epochs (ref train.py:92)")
    ap.add_argument("--val_batches", type=int, default=None,
                    help="cap validation batches (default: full 5%% split)")
    ap.add_argument("--warp_impl", type=str, default="auto",
                    choices=["auto", "xla", "pallas"],
                    help="auto=pallas on TPU (kernel-grad VJP, 124 vs "
                         "289 ms/step measured, convergence-matched); "
                         "xla = exact reference gradients")
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    os.makedirs(args.log_dir, exist_ok=True)
    mesh = make_mesh(("data",))
    n_dev = mesh.devices.size
    assert args.batch_size % n_dev == 0, (
        f"global batch {args.batch_size} must divide {n_dev} devices"
    )

    model_def = MODEL_REGISTRY[args.model]
    pm = model_def.pad_multiple
    if args.crop % pm:
        new_crop = max(pm, args.crop // pm * pm)
        print(f"crop {args.crop} -> {new_crop} ({args.model} needs %{pm})")
        args.crop = new_crop

    if args.septuplet and args.model not in ("rife_m", "v4.25"):
        print(f"note: --septuplet varies timestep but --model {args.model} "
              "has no timestep input (use rife_m or v4.25)")
    if args.synthetic:
        cls = SyntheticSeptuplets if args.septuplet else SyntheticTriplets
        train_ds = cls(n=args.synthetic_n or max(args.batch_size * 4, 64),
                       h=args.crop + 8, w=args.crop + 8)
        # validation batches are NOT cropped (augment=False, like the
        # reference full-frame evaluate) — size the synthetic val frames
        # at the pad-aligned crop itself so the pyramid divides.
        val_ds = cls(n=args.batch_size, h=args.crop, w=args.crop, seed=7)
        val_ds.split = "validation"
    elif args.septuplet:
        train_ds = VimeoSeptuplets(args.data, "train")
        val_ds = VimeoSeptuplets(args.data, "validation")
    else:
        train_ds = VimeoTriplets(args.data, "train")
        val_ds = VimeoTriplets(args.data, "validation")

    steps_per_epoch = max(1, len(train_ds) // args.batch_size // jax.process_count())
    total_steps = args.steps or (steps_per_epoch * args.epoch)
    world_scale = args.batch_size / 64.0  # reference: 4 ranks x batch16 => x1

    wd = args.weight_decay
    if wd is None:
        # v4.25 and the legacy presets use AdamW wd=1e-4
        # (train_log/RIFE_HDv3.py optimizer; oldmodel/RIFE_HD.py:135-138)
        wd = 1e-4 if args.model in ("v4.25", "hd", "hdv2") else 1e-3
    sched_override = None
    if args.model in ("hd", "hdv2"):
        # legacy scheduler: CyclicLR 1e-6 <-> 1e-3, 8000 up
        # (oldmodel/RIFE_HD.py:139-140)
        from rife_tpu.train.lr import cyclic_lr_schedule

        sched_override = cyclic_lr_schedule(world_scale=world_scale)
    state, tx, schedule = train_init(model_def, total_steps=total_steps,
                                     seed=args.seed, world_scale=world_scale,
                                     weight_decay=wd, schedule=sched_override)
    if args.resume:
        tree, meta = load_params(args.resume)
        # The on-disk tree is plain lists/dicts; restore into the live
        # pytree STRUCTURE (optax namedtuples etc.) by leaf order — both
        # sides sort dict keys and keep tuple field order, and leafless
        # nodes (EmptyState <-> {}) contribute nothing on either side.
        def restore(live, saved):
            leaves = [jnp.asarray(x) for x in jax.tree.leaves(saved)]
            return jax.tree.unflatten(jax.tree.structure(live), leaves)

        state = TrainState(
            params=restore(state.params, tree["params"]),
            opt_state=restore(state.opt_state, tree["opt_state"]),
            step=jnp.asarray(tree["step"], jnp.int32),
        )
        print(f"resumed from {args.resume} at step {int(state.step)}")

    # Warp impl: the Pallas kernel-grad VJP (fwd emits dI/dx, dI/dy;
    # d/img = flow-stopped scatter adjoint) measures 124.2 vs 288.6
    # ms/step bf16 at the reference config (tools/r3_exp23.py) with a
    # convergence curve matching the exact path to 3 decimals
    # (r3_exp24 vs r3_exp17) — so auto picks it on TPU.  --warp_impl
    # xla restores the reference's exact gradients (d/flow from f32
    # corner taps instead of the kernel's bf16 taps).
    from rife_tpu.ops import set_warp_impl

    if args.warp_impl == "auto":
        set_warp_impl("pallas" if jax.default_backend() == "tpu" else "xla")
    else:
        set_warp_impl(args.warp_impl)

    compute_dtype = jnp.dtype(args.dtype)
    with_vis = args.vis_interval > 0
    spc = max(1, args.steps_per_call)
    if spc > 1:
        from rife_tpu.parallel import shard_superbatch
        from rife_tpu.train import make_train_step_chained

        train_step = make_train_step_chained(
            model_def, tx, spc, mesh=mesh, compute_dtype=compute_dtype,
            with_vis=with_vis)
    else:
        train_step = make_train_step(model_def, tx, mesh=mesh,
                                     compute_dtype=compute_dtype,
                                     with_vis=with_vis)
    eval_step = make_eval_step(model_def, mesh=mesh, compute_dtype=compute_dtype)
    state = jax.device_put(state, replicated_sharding(mesh))

    logger = MetricLogger(args.log_dir)
    # u8 staging: image batches cross host->device as uint8 and the
    # jitted step does the /255 (train/loop._dev01) — 4x less transfer,
    # which matters when steps_per_call stages K batches per call.
    batches = batch_iterator(train_ds, args.batch_size, seed=args.seed, crop=args.crop,
                             process_index=jax.process_index(),
                             process_count=jax.process_count(),
                             workers=args.workers,
                             # the chained step drains spc batches per
                             # call — the producer needs at least that
                             # much queue to overlap the device call
                             prefetch=(max(args.prefetch, spc + 2)
                                       if spc > 1 else args.prefetch),
                             u8=True)
    step = int(state.step)
    t_data = t_train = 0.0
    buf = []
    t0 = time.perf_counter()
    for batch in batches:
        if spc > 1:
            # stage K host batches into one (K, B, ...) super-batch;
            # one jit call runs all K optimizer steps (dispatch paid once)
            buf.append(batch)
            if len(buf) < spc:
                continue
            call_batch = shard_superbatch(
                {k: np.stack([b[k] for b in buf]) for k in buf[0]}, mesh)
            buf = []
        else:
            call_batch = shard_batch(batch, mesh)
        t1 = time.perf_counter()
        t_data = t1 - t0
        if with_vis:
            state, metrics, vis = train_step(state, call_batch)
        else:
            state, metrics = train_step(state, call_batch)
        step_before, step = step, step + spc
        for i in range(spc):
            s = step_before + i + 1
            if s % 200 == 0 or s == 1:
                m = {k: float(v[i]) if spc > 1 else float(v)
                     for k, v in metrics.items()}
                t_train = time.perf_counter() - t1
                m.update(step=s, lr=float(schedule(s)),
                         t_data=round(t_data, 4),
                         t_train=round(t_train / spc, 4))
                logger.log("train", s, m)
                print(json.dumps(m))
        vis_due = with_vis and (
            step_before == 0
            or step_before // args.vis_interval != step // args.vis_interval)
        if vis_due and jax.process_index() == 0:
            from rife_tpu.utils.viz import dump_panels

            # chained calls emit the LAST sub-step's panel tensors, so
            # the panel index snaps to `step` (the window's last step)
            dump_panels(logger, step, jax.device_get(vis))
        epoch_done = step_before // steps_per_epoch != step // steps_per_epoch
        if epoch_done and jax.process_index() == 0:
            save_params(
                os.path.join(args.log_dir, "flownet.rtpu"),
                {
                    "params": jax.tree.map(np.asarray, state.params),
                    "opt_state": jax.tree.map(np.asarray, state.opt_state),
                    "step": np.asarray(step),
                },
                meta={"model": args.model, "step": step},
            )
        if epoch_done and (step // steps_per_epoch) % args.val_interval == 0:
            # Full 5% split (reference evaluate(), train.py:97-136); the
            # teacher PSNR is logged alongside the student's.
            psnrs, psnrs_tea = [], []
            val_iter = batch_iterator(val_ds, args.batch_size, crop=args.crop,
                                      augment=False, epochs=1)
            for i, vb in enumerate(val_iter):
                if args.val_batches is not None and i >= args.val_batches:
                    break
                out = eval_step(state.params, shard_batch(vb, mesh))
                psnrs.append(np.asarray(out["psnr"]))
                psnrs_tea.append(np.asarray(out["psnr_tea"]))
            if psnrs:
                val = {"psnr": float(np.mean(np.concatenate(psnrs))),
                       "psnr_tea": float(np.mean(np.concatenate(psnrs_tea)))}
                logger.log("validate", step, val)
                print(f"validation psnr: {val['psnr']:.4f} "
                      f"(teacher {val['psnr_tea']:.4f})")
        if step >= total_steps:
            break
        t0 = time.perf_counter()
    if buf:
        print(f"note: dropping {len(buf)} staged batch(es) < steps_per_call "
              f"at shutdown (pick --steps divisible by --steps_per_call)")
    if hasattr(batches, "close"):
        batches.close()  # stop the prefetch producer thread
    logger.close()
    print(f"training done at step {step}")


if __name__ == "__main__":
    main()
