#!/usr/bin/env python
"""Training CLI mirroring the reference ``scripts/train.py`` surface.

    python scripts/train.py --cfg experiments/mpii/....yaml
    python scripts/train.py --cfg ... --synthetic --epochs 2   # data-free

Reference call stack reproduced (SURVEY.md §3.1): config -> logger -> model
-> criterion(in-step) -> optimizer/schedule -> datasets/loaders -> epoch
loop of train()+validate() with best-checkpoint tracking; DataParallel is
replaced by a jax Mesh (data axis) and orbax replaces torch.save.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser(description="Train pose network (TPU)")
    p.add_argument("--cfg", required=True, help="experiment yaml")
    p.add_argument("--workers", type=int, default=None)
    p.add_argument("--synthetic", action="store_true",
                   help="use the synthetic dataset (no files needed)")
    p.add_argument("--samples", type=int, default=256,
                   help="synthetic dataset size")
    p.add_argument("--epochs", type=int, default=None,
                   help="override TRAIN.END_EPOCH")
    p.add_argument("--modelDir", type=str, default=None)
    p.add_argument("--logDir", type=str, default=None)
    p.add_argument("--dataDir", type=str, default=None)
    p.add_argument("--profile", action="store_true",
                   help="capture a jax profiler trace of epoch 0 into "
                        "LOG_DIR (view with tensorboard)")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host pod run: jax.distributed.initialize() "
                        "from TPU environment variables")
    return p.parse_args()


def main():
    args = parse_args()
    from epipolarpose_tpu.config import config, update_config, update_dir
    update_config(args.cfg)
    update_dir(config, args.modelDir, args.logDir, args.dataDir)
    if args.workers is not None:
        config.WORKERS = args.workers
    if args.epochs is not None:
        config.TRAIN.END_EPOCH = args.epochs
    if args.synthetic:
        if config.DATASET.LABEL_SOURCE == "triangulated":
            # SS training REQUIRES the multi-view rig (view_batches):
            # override even an explicitly-declared single-view synthetic
            # set (a 'DATASET: synthetic' SS debug config crashed here
            # before — caught in r4 verification)
            config.DATASET.DATASET = "synthetic_multiview"
        elif not config.DATASET.DATASET.startswith("synthetic"):
            # fully-supervised INTEGRAL configs get the rig too — its
            # records carry GT camera-frame 3D, so depth is genuinely
            # supervised and evaluate() runs the full MPJPE protocol (the
            # single-view synthetic set is 2D-only: z would train against
            # zero-weighted targets and eval as PCKh). Explicitly-
            # synthetic debug configs keep their declared dataset.
            config.DATASET.DATASET = (
                "synthetic_multiview"
                if str(config.MODEL.EXTRA.get("TARGET_TYPE")) == "integral"
                else "synthetic")

    if args.distributed:
        # pod-scale data parallelism (SURVEY §2.C): per-host processes join
        # over DCN; the mesh below then spans all hosts' devices and the
        # same sharded train step runs unchanged.
        import jax
        jax.distributed.initialize()

    import jax  # noqa: F811 (harmless re-import when not distributed)
    import numpy as np
    from epipolarpose_tpu.core import (
        CheckpointManager, create_logger, create_metric_writer,
        create_train_state, make_eval_step, make_train_step, train, validate)
    from epipolarpose_tpu.data import get_dataset, epoch_loader
    from epipolarpose_tpu.models import get_model
    from epipolarpose_tpu.parallel import make_mesh

    logger, output_dir, tb_dir = create_logger(config, args.cfg, "train")
    logger.info(f"devices: {jax.devices()}")
    writer = create_metric_writer(tb_dir)

    mesh = make_mesh(config)
    model = get_model(config, is_train=True)

    ds_kwargs = {"num_samples": args.samples} \
        if config.DATASET.DATASET == "synthetic" else (
            {"num_frames": max(args.samples // 4, 4)}
            if config.DATASET.DATASET == "synthetic_multiview" else {})
    train_ds = get_dataset(config, config.DATASET.TRAIN_SET, True,
                           **ds_kwargs)
    valid_ds = get_dataset(config, config.DATASET.TEST_SET, False,
                           **ds_kwargs)

    batch_size = int(config.TRAIN.BATCH_SIZE) * mesh.shape["data"]
    self_supervised = (config.DATASET.LABEL_SOURCE == "triangulated")
    # LR-schedule boundaries count OPTIMIZER steps: the multiview loader
    # yields one step per GROUP batch (V records each), not per record
    epoch_units = len(getattr(train_ds, "view_groups", train_ds.records)) \
        if self_supervised else len(train_ds)
    steps_per_epoch = max(epoch_units // batch_size, 1)
    state = create_train_state(config, model, jax.random.PRNGKey(
        int(config.TPU.SEED)), steps_per_epoch)

    if config.MODEL.PRETRAINED:
        from epipolarpose_tpu.core import load_model_variables
        logger.info(f"loading pretrained {config.MODEL.PRETRAINED}")
        # template=None: untyped restore — merge_matching below must see
        # shape-mismatched heads (2D teacher -> 3D student) to skip them
        variables = load_model_variables(
            config.MODEL.PRETRAINED, None,
            int(config.MODEL.EXTRA.NUM_LAYERS))

        def merge_matching(dst, src, path=""):
            """Copy only shape-compatible leaves: a 2D teacher checkpoint
            initializes a 3D student's backbone/deconv while its J-channel
            final_layer must NOT clobber the J*D-channel head (the
            reference reinitializes the head the same way)."""
            out = dict(dst)
            for k, v in src.items():
                if k not in dst:
                    continue
                if isinstance(v, dict) and isinstance(dst[k], dict):
                    out[k] = merge_matching(dst[k], v, f"{path}{k}/")
                elif getattr(v, "shape", None) == \
                        getattr(dst[k], "shape", ()):
                    out[k] = v
                else:
                    logger.info(f"pretrained: skipping {path}{k} "
                                f"{getattr(v, 'shape', '?')} != "
                                f"{getattr(dst[k], 'shape', '?')}")
            return out

        state = state.replace(
            params=merge_matching(state.params, variables["params"]),
            batch_stats=merge_matching(state.batch_stats,
                                       variables["batch_stats"]))

    # metric direction is dataset-defined: PCKh up, MPJPE down
    higher_better = bool(getattr(valid_ds, "perf_higher_is_better", True))
    ckpt = CheckpointManager(os.path.join(output_dir, "checkpoints"),
                             best_mode="max" if higher_better else "min")
    begin_epoch = int(config.TRAIN.BEGIN_EPOCH)
    if config.TRAIN.RESUME:
        state, begin_epoch = ckpt.restore(state)
        logger.info(f"resumed at epoch {begin_epoch}")

    if self_supervised:
        from epipolarpose_tpu.core.self_supervised import (
            make_ss_train_step, load_teacher)
        teacher = load_teacher(config, state)
        refiner = None
        if config.TPU.SS_REFINER:
            from epipolarpose_tpu.core.self_supervised import load_refiner
            refiner = load_refiner(config, config.TPU.SS_REFINER)
            logger.info(f"refining pseudo-GT with {config.TPU.SS_REFINER}")
    fused = max(1, int(config.TPU.FUSED_STEPS))
    if self_supervised:
        tstep = make_ss_train_step(
            config, model, teacher, mesh=mesh, refiner=refiner,
            flip_pairs=getattr(train_ds, "flip_pairs", ()),
            fused_steps=fused)
    else:
        tstep = make_train_step(config, model, mesh=mesh, fused_steps=fused)
    estep = make_eval_step(config, model, mesh=mesh,
                           flip_pairs=getattr(train_ds, "flip_pairs", ()),
                           fused_steps=fused)

    import functools
    # single-host: device_put with mesh shardings; pod runs: assemble the
    # global array from this host's loader shard (falls through inside)
    from epipolarpose_tpu.parallel import shard_batch_local
    place = functools.partial(shard_batch_local, mesh=mesh)
    # fused-step super-batches carry a leading (K,) scan axis; the batch
    # axis to shard over 'data' is then axis 1 (train AND eval fuse)
    place_fused = functools.partial(shard_batch_local, mesh=mesh,
                                    batch_axis=1) if fused > 1 else place

    best_perf = -np.inf if higher_better else np.inf
    for epoch in range(begin_epoch, int(config.TRAIN.END_EPOCH)):
        if args.profile and epoch == begin_epoch:
            jax.profiler.start_trace(tb_dir)
        loader = epoch_loader(train_ds, batch_size, epoch,
                              multiview=self_supervised,
                              prefetch=int(config.TPU.PREFETCH),
                              sharding=place_fused, fused_steps=fused)
        state, avg_loss = train(config, loader, state, tstep, epoch, writer,
                                output_dir)
        if args.profile and epoch == begin_epoch:
            jax.block_until_ready(state.params)
            jax.profiler.stop_trace()
            logger.info(f"profiler trace written to {tb_dir}")

        # reference scales the eval loader by device count too
        # (DataLoader(bs=TEST.BATCH_SIZE*len(gpus)) in scripts/train.py [H])
        vloader = epoch_loader(
            valid_ds, int(config.TEST.BATCH_SIZE) * mesh.shape["data"],
            epoch, is_train=False, sharding=place_fused,
            fused_steps=fused)
        name_values, perf = validate(config, vloader, valid_ds, state,
                                     estep, writer, output_dir)
        best_perf = (max if higher_better else min)(best_perf, perf)
        ckpt.save(int(state.step), state, epoch, float(perf))
        logger.info(f"epoch {epoch}: loss {avg_loss:.5f} perf {perf:.3f} "
                    f"best {best_perf:.3f}")

    ckpt.save_final(state)
    ckpt.wait()
    ckpt.close()
    logger.info("done")


if __name__ == "__main__":
    main()
