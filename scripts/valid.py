#!/usr/bin/env python
"""Evaluation CLI mirroring the reference ``scripts/valid.py``.

    python scripts/valid.py --cfg experiments/h36m/valid_r50_256_integral.yaml
    python scripts/valid.py --cfg ... --synthetic          # data-free smoke

Loads TEST.MODEL_FILE (orbax dir or torch .pth.tar) and runs validate() on
the test split, printing the reference-style metric table (SURVEY §3.4).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser(description="Validate pose network (TPU)")
    p.add_argument("--cfg", required=True)
    p.add_argument("--model-file", default=None,
                   help="override TEST.MODEL_FILE")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--samples", type=int, default=64)
    # reference valid.py carries the same update_dir args as train.py [M]
    p.add_argument("--modelDir", type=str, default=None)
    p.add_argument("--logDir", type=str, default=None)
    p.add_argument("--dataDir", type=str, default=None)
    p.add_argument("--distributed", action="store_true",
                   help="multi-host pod run: jax.distributed.initialize() "
                        "from TPU environment variables (same flag as "
                        "train.py; validate() all-gathers host-sharded "
                        "predictions so every process prints the table)")
    return p.parse_args()


def main():
    args = parse_args()
    from epipolarpose_tpu.config import config, update_config, update_dir
    update_config(args.cfg)
    update_dir(config, args.modelDir, args.logDir, args.dataDir)
    if args.model_file:
        config.TEST.MODEL_FILE = args.model_file
    if args.synthetic and not config.DATASET.DATASET.startswith("synthetic"):
        # integral configs -> the multi-view rig: GT camera-frame 3D, so
        # evaluate() exercises the full MPJPE protocol (see train.py)
        config.DATASET.DATASET = (
            "synthetic_multiview"
            if str(config.MODEL.EXTRA.get("TARGET_TYPE")) == "integral"
            else "synthetic")

    if args.distributed:
        # pod-scale eval (SURVEY §2.C): each host decodes its 1/P slice of
        # every batch (epoch_loader's process_index/count defaults),
        # shard_batch_local assembles global arrays, validate() gathers.
        import jax
        jax.distributed.initialize()

    import jax  # noqa: F811 (harmless re-import when not distributed)
    from epipolarpose_tpu.core import (
        create_logger, create_train_state, make_eval_step, validate)
    from epipolarpose_tpu.data import get_dataset, epoch_loader
    from epipolarpose_tpu.models import get_model
    from epipolarpose_tpu.parallel import make_mesh

    logger, output_dir, _ = create_logger(config, args.cfg, "valid")
    mesh = make_mesh(config)
    model = get_model(config, is_train=False)
    state = create_train_state(config, model, jax.random.PRNGKey(0), 1)

    mf = config.TEST.MODEL_FILE
    if mf:
        from epipolarpose_tpu.core import load_model_variables
        v = load_model_variables(
            mf, {"params": state.params, "batch_stats": state.batch_stats},
            int(config.MODEL.EXTRA.NUM_LAYERS))
        state = state.replace(params=v["params"],
                              batch_stats=v["batch_stats"])
        logger.info(f"loaded {mf}")

    ds_kwargs = {"num_samples": args.samples} \
        if config.DATASET.DATASET == "synthetic" else (
            {"num_frames": max(args.samples // 4, 4)}
            if config.DATASET.DATASET == "synthetic_multiview" else {})
    ds = get_dataset(config, config.DATASET.TEST_SET, False, **ds_kwargs)
    fused = max(1, int(config.TPU.FUSED_STEPS))
    estep = make_eval_step(config, model, mesh=mesh,
                           flip_pairs=getattr(ds, "flip_pairs", ()),
                           fused_steps=fused)
    import functools
    from epipolarpose_tpu.parallel import shard_batch_local
    # eval batch scales by device count like the reference's
    # DataLoader(bs=TEST.BATCH_SIZE*len(gpus)) [H]; fused super-batches
    # shard the batch axis at axis 1 (leading axis is the scan axis)
    loader = epoch_loader(ds,
                          int(config.TEST.BATCH_SIZE) * mesh.shape["data"],
                          0, is_train=False, fused_steps=fused,
                          sharding=functools.partial(
                              shard_batch_local, mesh=mesh,
                              **({"batch_axis": 1} if fused > 1 else {})))
    name_values, perf = validate(config, loader, ds, state, estep,
                                 output_dir=output_dir)
    logger.info(f"perf: {perf:.3f}")


if __name__ == "__main__":
    main()
