#!/usr/bin/env python
"""Train the pose refinement unit (reference ``refiner/`` side-car).

    python scripts/train_refiner.py --cfg experiments/h36m/train_fs_r50_256_integral.yaml \
        [--synthetic] [--steps 2000] [--out output/refiner]

Trains the residual MLP to denoise triangulation-like corrupted 3D poses
back to GT, then reports before/after MPJPE on a held-out split.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", required=True)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--noise-mm", type=float, default=25.0)
    p.add_argument("--out", default="output/refiner")
    return p.parse_args()


def main():
    args = parse_args()
    from epipolarpose_tpu.config import config, update_config
    update_config(args.cfg)
    if args.synthetic:
        config.DATASET.DATASET = "synthetic_multiview"

    import jax
    import jax.numpy as jnp
    import numpy as np
    from epipolarpose_tpu.core.refine import (
        create_refiner_state, make_refiner_apply, make_refiner_train_step,
        synth_noise)
    from epipolarpose_tpu.ops.metrics import mpjpe

    J = int(config.MODEL.NUM_JOINTS)
    rng = np.random.default_rng(0)

    if config.DATASET.DATASET.startswith("synthetic"):
        # pose bank: synthetic 3D poses (camera frame, root-relative mm)
        poses = rng.uniform(-400, 400, (4096, J, 3)).astype(np.float32)
    else:
        from epipolarpose_tpu.data import get_dataset
        ds = get_dataset(config, config.DATASET.TRAIN_SET, False)
        poses = np.stack([r.joints_3d for r in ds.records
                          if r.joints_3d is not None]).astype(np.float32)
    poses = poses - poses[:, :1]
    n_val = max(len(poses) // 10, 1)
    train_p, val_p = poses[:-n_val], poses[-n_val:]

    model, state = create_refiner_state(J, jax.random.PRNGKey(0))
    step = make_refiner_train_step(model)
    apply = make_refiner_apply(model)

    key = jax.random.PRNGKey(1)
    for i in range(args.steps):
        key, k1, k2 = jax.random.split(key, 3)
        idx = rng.integers(0, len(train_p), args.batch)
        gt = jnp.asarray(train_p[idx])
        noisy = synth_noise(k1, gt, sigma_mm=args.noise_mm)
        state, loss = step(state, noisy, gt, k2)
        if i % 100 == 0:
            print(f"step {i}: loss {float(loss):.3f}")

    key, k = jax.random.split(key)
    val_gt = jnp.asarray(val_p)
    val_noisy = synth_noise(k, val_gt, sigma_mm=args.noise_mm)
    refined = apply(state, val_noisy)
    before = float(mpjpe(val_noisy, val_gt))
    after = float(mpjpe(refined, val_gt))
    print(f"MPJPE noisy->GT: {before:.2f} mm ; refined->GT: {after:.2f} mm")

    os.makedirs(args.out, exist_ok=True)
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    path = os.path.abspath(os.path.join(args.out, "refiner_state"))
    ckptr.save(path, {"params": state.params,
                      "batch_stats": state.batch_stats}, force=True)
    ckptr.wait_until_finished()
    print(f"saved {path}")


if __name__ == "__main__":
    main()
