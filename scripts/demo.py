#!/usr/bin/env python
"""Single-image 3D pose demo — the reference demo.ipynb as a script.

    python scripts/demo.py --cfg experiments/h36m/valid_r50_256_integral.yaml \
        --image sample_images/person.jpg [--model-file <ckpt>] [--out demo_out]

Flow (SURVEY.md §3.5): read image -> center/scale box -> affine crop to
IMAGE_SIZE -> normalize -> forward -> soft-argmax -> root-relative 3D joints
-> (optional refiner) -> save 2D overlay + 3D skeleton plot.

Without --image it renders a synthetic sample so the demo runs data-free.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser(description="3D pose demo")
    p.add_argument("--cfg", required=True)
    p.add_argument("--image", default=None)
    p.add_argument("--model-file", default=None)
    p.add_argument("--out", default="demo_out")
    p.add_argument("--refiner-file", default=None,
                   help="orbax checkpoint of a trained refinement unit; "
                        "applied to the predicted 3D pose")
    p.add_argument("--focal", type=float, default=1150.0,
                   help="nominal focal length (px) for lifting (x, y) "
                        "pixels to camera-frame mm (H36M cameras ~1150)")
    p.add_argument("--root-depth", type=float, default=4500.0,
                   help="assumed absolute root depth (mm) for the lift")
    return p.parse_args()


def main():
    args = parse_args()
    from epipolarpose_tpu.config import config, update_config
    update_config(args.cfg)
    if args.model_file:
        config.TEST.MODEL_FILE = args.model_file

    import jax
    import jax.numpy as jnp
    import numpy as np
    from epipolarpose_tpu.core import create_train_state, make_eval_step
    from epipolarpose_tpu.models import get_model
    from epipolarpose_tpu.utils import (plot_3d_skeleton,
                                        save_batch_image_with_joints)

    os.makedirs(args.out, exist_ok=True)
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
        print(f"loaded {mf}")

    W, H = (int(v) for v in config.MODEL.IMAGE_SIZE)
    if args.image:
        import cv2
        img = cv2.cvtColor(cv2.imread(args.image), cv2.COLOR_BGR2RGB)
        img = img.astype(np.float32) / 255.0
        h, w = img.shape[:2]
        center = np.array([w / 2, h / 2], np.float32)
        scale = np.array([max(w, h) / 200.0] * 2, np.float32)
    else:
        from epipolarpose_tpu.data import SyntheticPoseDataset
        ds = SyntheticPoseDataset(config, num_samples=1, is_train=False)
        rec = ds.records[0]
        img = ds._read_image(rec.image).astype(np.float32) / 255.0
        center, scale = rec.center, rec.scale
        print("no --image given: using a synthetic sample")

    # crop like the dataset (host warp; eval has no rotation)
    import cv2
    from epipolarpose_tpu.geometry import affine as A
    M = A.get_affine_transform_np(center, scale, 0.0, (W, H))
    crop = cv2.warpAffine(img, M, (W, H), flags=cv2.INTER_LINEAR)

    batch = {
        "input": crop[None].astype(np.float32),
        "center": center[None],
        "scale": scale[None],
    }
    estep = make_eval_step(config, model)
    out = estep(state, batch)
    preds = np.asarray(out["preds"])[0]

    overlay = os.path.join(args.out, "pose_2d.jpg")
    save_batch_image_with_joints(
        batch["input"], _to_crop(preds, M)[None],
        np.ones((1, preds.shape[0], 1)), overlay)
    print(f"wrote {overlay}")

    if preds.shape[-1] == 3:
        # lift (x px, y px, z rel-mm) to camera-frame mm with a nominal
        # pinhole (no intrinsics in the demo): consistent units for the
        # 3D plot AND for the refiner, which is trained exclusively on
        # root-relative camera-frame mm poses
        h_src, w_src = img.shape[:2]
        z_abs = args.root_depth + preds[:, 2]
        x_mm = (preds[:, 0] - w_src / 2) / args.focal * z_abs
        y_mm = (preds[:, 1] - h_src / 2) / args.focal * z_abs
        pose3d = np.stack([x_mm, y_mm, z_abs], axis=-1)
        pose3d = (pose3d - pose3d[:1]).astype(np.float32)
        if args.refiner_file:
            from epipolarpose_tpu.core.self_supervised import load_refiner
            refine = load_refiner(config, args.refiner_file)
            pose3d = np.asarray(refine(pose3d[None]))[0]
            print(f"applied refiner {args.refiner_file}")
        plot = os.path.join(args.out, "pose_3d.png")
        plot_3d_skeleton(pose3d, plot, title="predicted 3D pose (mm)")
        print(f"wrote {plot}")


def _to_crop(preds, M):
    """Source-space (x, y) -> crop space for overlay drawing."""
    import numpy as np
    xy = preds[:, :2]
    return xy @ M[:, :2].T + M[:, 2]


if __name__ == "__main__":
    main()
