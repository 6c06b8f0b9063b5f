#!/usr/bin/env python
"""Train the pose refinement unit (reference ``refiner/`` side-car).

    python scripts/train_refiner.py --cfg experiments/h36m/train_fs_r50_256_integral.yaml \
        [--synthetic] [--steps 2000] [--out output/refiner]

Pairing (matches the reference refiner's use: denoise TRIANGULATED poses —
SURVEY.md §2.A "Refinement unit" [M]):

- ``--synthetic``: structured kinematic-tree skeletons (constant bone
  lengths, low-dim pose manifold — data/synthetic.py) are projected through
  the 4-camera rig, the 2D detections are corrupted (Gaussian pixel noise +
  outlier detections, the teacher's real failure modes), and the DLT
  triangulation of those detections is the refiner's INPUT; the skeleton is
  its target. Training pairs are root-relative camera-frame mm in each of
  the rig's frames (the frame the SS loop applies the refiner in).
- real dataset: GT poses corrupted by the structured noise model
  (``core.refine.synth_noise``) stand in until real triangulations exist.

Reports before/after MPJPE on a held-out split of POSES (split before the
per-camera expansion so no pose leaks between train and val).
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
    p.add_argument("--poses", type=int, default=2048,
                   help="synthetic pose-bank size (before x4 camera frames)")
    p.add_argument("--noise-mm", type=float, default=25.0,
                   help="real-dataset path: synth_noise sigma")
    p.add_argument("--px-sigma", type=float, default=2.5,
                   help="synthetic path: 2D detection noise (px)")
    p.add_argument("--outlier-prob", type=float, default=0.07,
                   help="synthetic path: per-(view,joint) outlier rate")
    p.add_argument("--hidden", type=int, default=1024,
                   help="refiner width (reference martinez-style: 1024)")
    p.add_argument("--blocks", type=int, default=2)
    p.add_argument("--dropout", type=float, default=0.5)
    p.add_argument("--out", default="output/refiner")
    return p.parse_args()


def _triangulated_pairs(rng, n_poses: int, J: int, px_sigma: float,
                        outlier_prob: float):
    """(noisy, gt) root-relative camera-frame pairs from the synthetic rig.

    Returns arrays of shape (V * n_poses, J, 3), ordered so a split on the
    LAST 1/k is a split on poses (pose index varies fastest within a view
    block would leak; we interleave (pose, view) with pose slowest)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from epipolarpose_tpu.data.synthetic import make_rig, synth_skeleton_poses
    from epipolarpose_tpu.geometry import (project_point_radial,
                                           undistort_points,
                                           world_to_camera_frame)
    from epipolarpose_tpu.geometry.triangulation import triangulate

    gt_world = synth_skeleton_poses(rng, n_poses, J)
    gt_world = gt_world + rng.uniform(
        -300, 300, (n_poses, 1, 3)).astype(np.float32)
    gt_world[..., 2] += 900.0           # rig looks at z ~ 900 (make_rig)

    rig = make_rig(4)
    V = len(rig)
    cam = jax.tree.map(lambda *x: jnp.stack(x), *rig)
    det = np.zeros((n_poses, V, J, 2), np.float32)
    for v, c in enumerate(rig):
        det[:, v] = np.asarray(
            project_point_radial(jnp.asarray(gt_world), c)[0])
    det += rng.normal(0, px_sigma, det.shape).astype(np.float32)
    is_out = rng.random((n_poses, V, J, 1)) < outlier_prob
    det += np.where(is_out,
                    rng.uniform(-60, 60, det.shape), 0).astype(np.float32)

    und = undistort_points(jnp.asarray(det), cam)
    X_w, _ = triangulate(und, cam.P)                      # (n, J, 3) world

    noisy = np.stack([np.asarray(world_to_camera_frame(X_w, c))
                      for c in rig], axis=1)              # (n, V, J, 3)
    gt = np.stack([np.asarray(world_to_camera_frame(jnp.asarray(gt_world),
                                                    c))
                   for c in rig], axis=1)
    noisy = noisy.reshape(n_poses * V, J, 3)
    gt = gt.reshape(n_poses * V, J, 3)
    return noisy.astype(np.float32), gt.astype(np.float32)


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
        noisy, gt = _triangulated_pairs(rng, args.poses, J, args.px_sigma,
                                        args.outlier_prob)
    else:
        from epipolarpose_tpu.data import get_dataset
        ds = get_dataset(config, config.DATASET.TRAIN_SET, False)
        gt = np.stack([r.joints_3d for r in ds.records
                       if r.joints_3d is not None]).astype(np.float32)
        noisy = np.asarray(synth_noise(jax.random.PRNGKey(2),
                                       jnp.asarray(gt),
                                       sigma_mm=args.noise_mm))
    # root-relative (the frame the refiner is applied in everywhere)
    noisy = noisy - noisy[:, :1]
    gt = gt - gt[:, :1]
    n_val = max(len(gt) // 10, 1)
    train_n, val_n = noisy[:-n_val], noisy[-n_val:]
    train_g, val_g = gt[:-n_val], gt[-n_val:]

    model, state = create_refiner_state(
        J, jax.random.PRNGKey(0), hidden=args.hidden, blocks=args.blocks,
        dropout=args.dropout)
    step = make_refiner_train_step(model)
    apply = make_refiner_apply(model)

    key = jax.random.PRNGKey(1)
    for i in range(args.steps):
        key, k2 = jax.random.split(key)
        idx = rng.integers(0, len(train_n), args.batch)
        state, loss = step(state, jnp.asarray(train_n[idx]),
                           jnp.asarray(train_g[idx]), k2)
        if i % 100 == 0:
            print(f"step {i}: loss {float(loss):.3f}")

    refined = apply(state, jnp.asarray(val_n))
    before = float(mpjpe(jnp.asarray(val_n), jnp.asarray(val_g)))
    after = float(mpjpe(refined, jnp.asarray(val_g)))
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
