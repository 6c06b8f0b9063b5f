#!/usr/bin/env python
"""Offline pseudo-GT generation — the reference's actual SS workflow.

    python scripts/generate_pseudo_gt.py --cfg experiments/h36m/train_ss_r50_256_integral.yaml \
        [--synthetic] [--out pseudo_gt.json]

Runs the frozen 2D teacher over every multi-view group, triangulates
(confidence-weighted DLT, or rig-estimated when TPU.SS_CAMERAS=estimated),
and writes per-record ABSOLUTE camera-frame 3D joints (mm) to a json that
can be merged into annot files (``joints_3d`` field) — absolute, because
the eval protocol's pixel2cam back-projection keys on the GT root depth;
the reported pseudo-GT error is computed root-relative. The reference did
exactly this on host numpy; here the whole sweep is batched jits on device
(SURVEY §3.2 — judged config 3 at dataset scale).

Also reports pseudo-GT MPJPE against dataset GT when available.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", required=True)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--samples", type=int, default=32)
    p.add_argument("--groups-per-batch", type=int, default=8)
    p.add_argument("--out", default="pseudo_gt.json")
    p.add_argument("--gt-detections", action="store_true",
                   help="bypass the teacher and triangulate the dataset's "
                        "GT 2D joints (isolates geometry quality)")
    p.add_argument("--merge-into", default=None,
                   help="annot json to fold the pseudo-GT into (the "
                        "reference's stage-2 input)")
    p.add_argument("--merge-out", default=None,
                   help="output path for the merged annot json "
                        "(default: <merge-into>.pseudo.json)")
    p.add_argument("--merge-conf-min", type=float, default=0.0,
                   help="skip records whose min teacher confidence is "
                        "below this when merging")
    p.add_argument("--refiner", default=None,
                   help="refinement-unit checkpoint: denoise the "
                        "triangulated poses before writing (the paper's "
                        "offline 'SS + R' rows)")
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
    from epipolarpose_tpu.core.self_supervised import (
        generate_pseudo_gt, load_teacher, teacher_detect)
    from epipolarpose_tpu.core.steps import normalize_images
    from epipolarpose_tpu.data import get_dataset
    from epipolarpose_tpu.geometry import world_to_camera_frame

    ds_kwargs = {"num_frames": max(args.samples // 4, 2)} \
        if config.DATASET.DATASET == "synthetic_multiview" else {}
    ds = get_dataset(config, config.DATASET.TRAIN_SET, False, **ds_kwargs)
    teacher = load_teacher(config)
    num_joints = int(config.MODEL.NUM_JOINTS)

    use_gt = bool(args.gt_detections)
    gt_src = None
    if use_gt:
        gt_src = np.stack([r.joints for r in ds.records]).astype(np.float32)

    refiner = None
    if args.refiner:
        from epipolarpose_tpu.core.self_supervised import load_refiner
        refiner = load_refiner(config, args.refiner)
        print(f"refining pseudo-GT with {args.refiner}")

    @jax.jit
    def process(batch, det_override=None):
        G, V = batch["input"].shape[:2]
        flat = lambda x: x.reshape((G * V,) + x.shape[2:])
        if det_override is not None:
            det = det_override
            conf = jnp.ones(det.shape[:-1], jnp.float32)
        else:
            imgs = normalize_images(flat(batch["input"]))
            det, conf = teacher_detect(config, teacher, imgs,
                                       flat(batch["center"]),
                                       flat(batch["scale"]))
        det = det.reshape(G, V, num_joints, 2)
        conf = conf.reshape(G, V, num_joints)
        X_w, res = generate_pseudo_gt(config, det, conf, batch["camera"])
        if refiner is not None:
            # reference 'SS + R': the refinement unit denoises the
            # root-relative triangulated pose before it becomes a label
            root = X_w[:, :1]
            X_w = root + refiner(X_w - root)
        X_cam = world_to_camera_frame(X_w[:, None], batch["camera"])
        return X_w, X_cam, conf.min(axis=1), res

    results = {}
    errs = []
    root = 0
    # clamp so small datasets still produce output (view_batches drops the
    # remainder like the reference's drop_last loader)
    gpb = max(min(args.groups_per_batch, len(ds.view_groups)), 1)
    for batch in ds.view_batches(gpb, shuffle=False):
        gt3 = batch.pop("joints_3d", None)
        idx = np.asarray(batch["index"])                  # (G, V)
        det_override = jnp.asarray(gt_src[idx.reshape(-1)]) if use_gt \
            else None
        X_w, X_cam, conf, res = process(batch, det_override)
        X_cam = np.asarray(X_cam)
        for g in range(idx.shape[0]):
            for v in range(idx.shape[1]):
                rel = X_cam[g, v] - X_cam[g, v, root:root + 1]
                results[int(idx[g, v])] = {
                    "joints_3d": X_cam[g, v].tolist(),
                    "conf": np.asarray(conf)[g].tolist(),
                    "residual": float(np.asarray(res)[g].mean()),
                }
                if gt3 is not None:
                    gt_rel = gt3[g, v] - gt3[g, v, root:root + 1]
                    errs.append(np.linalg.norm(rel - gt_rel, axis=-1).mean())
    with open(args.out, "w") as f:
        json.dump(results, f)
    print(f"wrote {args.out}: {len(results)} records")
    if errs:
        print(f"pseudo-GT MPJPE vs dataset GT: {np.mean(errs):.2f} mm")
    if args.merge_into:
        from epipolarpose_tpu.data.pseudo_gt import merge_pseudo_gt_into_annot
        out = args.merge_out or f"{args.merge_into}.pseudo.json"
        n = merge_pseudo_gt_into_annot(args.merge_into, args.out, out,
                                       conf_min=args.merge_conf_min)
        print(f"merged pseudo-GT into {n} records -> {out}")


if __name__ == "__main__":
    main()
