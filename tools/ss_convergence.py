#!/usr/bin/env python
"""SS convergence experiment: teacher pretrain -> frozen-teacher SS loop,
student MPJPE curve vs the pseudo-GT floor (VERDICT r3 next #4; judged
config 4's convergence evidence — SURVEY §3.2/3.3).

    python tools/ss_convergence.py                         # chip scale
    python tools/ss_convergence.py --preset ci             # CI scale

Phases (all on the default jax platform — the real TPU under axon):
1. train a 2D gaussian-head teacher on the synthetic multi-view rig's
   clean crops (GT 2D supervision — the MPII-pretrain stand-in);
2. freeze it; measure the pseudo-GT floor (teacher -> decode -> undistort
   -> weighted DLT vs GT world poses);
3. run the full SS loop (make_ss_train_step) on multi-view batches and
   evaluate student MPJPE on held-out frames every few steps.

Prints a markdown curve table for docs/SS_TEACHER.md. Batches are decoded
once and kept device-resident: the experiment demonstrates OPTIMIZATION
behavior (student MPJPE descending toward the pseudo-GT floor); input-fed
throughput is bench.py's job.
"""

from __future__ import annotations

import argparse
import copy
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", default="experiments/h36m/"
                   "train_ss_r50_256_integral.yaml")
    p.add_argument("--preset", choices=["chip", "ci"], default="chip")
    p.add_argument("--frames", type=int, default=None,
                   help="train time instants (x4 views each)")
    p.add_argument("--val-frames", type=int, default=None)
    p.add_argument("--groups", type=int, default=None,
                   help="multi-view groups per SS batch")
    p.add_argument("--teacher-steps", type=int, default=None)
    p.add_argument("--ss-steps", type=int, default=None)
    p.add_argument("--eval-every", type=int, default=None)
    p.add_argument("--pose-mode", choices=["uniform", "skeleton"],
                   default=None, help="synthetic pose bank (default: "
                   "preset — chip uses skeleton, ci uniform)")
    p.add_argument("--eval-on", choices=["val", "train", "both"],
                   default=None,
                   help="eval set: held-out frames, the training poses "
                   "(clean crops), or both curves (decomposes the gap to "
                   "the floor into optimization vs generalization)")
    p.add_argument("--depth-cue", type=float, default=0.0,
                   help="perspective size-cue exponent for the synthetic "
                   "renderer (0=off/constant blob size, 1=true "
                   "perspective, >1 amplified). Makes per-joint monocular "
                   "depth observable from appearance — the dose-response "
                   "experiment behind SS_TEACHER.md's residual analysis")
    return p.parse_args()


_PRESETS = {
    # r50 @ 256^2, depth 64: the judged SS config's architecture.
    # teacher_steps: heatmap-MSE acc on this set accelerates late (measured
    # r4: 0.16 @600, steps are ~14 ms once compiled — train until good).
    # pose_mode=skeleton: held-out generalization requires learnable
    # monocular depth — with the i.i.d.-uniform bank, root-relative depth
    # is unobservable from one view and held-out MPJPE floors at the
    # depth-prior error (~290 mm measured r4) regardless of SS steps.
    "chip": dict(frames=64, val_frames=16, groups=16, teacher_steps=3000,
                 ss_steps=240, eval_every=30, pose_mode="skeleton",
                 eval_on="both"),
    # r18 @ 64^2, depth 4: seconds on an 8-device CPU mesh (CI pin)
    "ci": dict(frames=12, val_frames=6, groups=4, teacher_steps=150,
               ss_steps=48, eval_every=8, pose_mode="uniform",
               eval_on="train"),
}


def make_teacher_cfg(cfg):
    """2D gaussian-head view of the same geometry (MPII-pretrain twin)."""
    t = copy.deepcopy(cfg)
    t.MODEL.NAME = "pose_resnet"
    t.MODEL.EXTRA.TARGET_TYPE = "gaussian"
    t.MODEL.EXTRA.DEPTH_DIM = 1
    t.LOSS.TYPE = "JointsMSELoss"
    t.TRAIN.LR = 0.003
    if int(t.MODEL.EXTRA.HEATMAP_SIZE[0]) <= 16:
        t.MODEL.EXTRA.SIGMA = 1.0        # tight blob on tiny heatmaps
    return t


def run(cfg, frames, val_frames, groups, teacher_steps, ss_steps,
        eval_every, log=print, detector="teacher", noise_px=2.0,
        merge_backbone=True, eval_on="val", pose_mode="uniform",
        depth_cue=0.0):
    """``detector='teacher'``: the chip experiment — pretrain a real 2D
    teacher, freeze it, SS loop through it. ``detector='gt_noise'``: skip
    the teacher; noisy GT detections ride in the batch (``det_src`` — the
    offline-detections route) so the pin isolates the SS optimization +
    geometry path at CI scale, where an affordable teacher's pseudo-GT
    floor sits ABOVE the warm-started student (measured r4: floor 549 mm
    vs start 531 — nothing to descend to; the chip-scale teacher has no
    such problem). ``merge_backbone=False`` starts the student from
    random init instead of the teacher/2D backbone. ``eval_on='train'``
    evaluates the curve on the TRAINING poses (clean crops, full
    validate() protocol): at CI scale a handful of synthetic frames
    cannot support held-out generalization (measured r4: train loss
    descends while 6 held-out frames' MPJPE climbs), so the fast pin
    asserts optimization-toward-the-floor; generalization is the chip
    experiment's job (eval_on='val', 64 train / 16 held-out frames)."""
    import jax
    import jax.numpy as jnp
    from epipolarpose_tpu.core import (create_train_state, make_eval_step,
                                       make_train_step, validate)
    from epipolarpose_tpu.core.self_supervised import (
        Teacher, generate_pseudo_gt, make_ss_train_step, teacher_detect)
    from epipolarpose_tpu.core.steps import normalize_images
    from epipolarpose_tpu.data import SyntheticMultiviewDataset
    from epipolarpose_tpu.models import get_model

    image_shape = tuple(int(v) for v in cfg.MODEL.IMAGE_SIZE)
    ds = SyntheticMultiviewDataset(cfg, num_frames=frames, is_train=True,
                                   image_shape=image_shape, seed=0,
                                   pose_mode=pose_mode, depth_cue=depth_cue)
    ds_val = SyntheticMultiviewDataset(
        cfg, num_frames=frames if eval_on == "train" else val_frames,
        is_train=False, image_shape=image_shape,
        seed=0 if eval_on == "train" else 1, pose_mode=pose_mode,
        depth_cue=depth_cue)
    # eval_on='both': a second eval set over the TRAINING poses (clean
    # crops, same seed-0 bank) decomposes the gap to the pseudo-GT floor —
    # train-MPJPE gap = optimization/representation, (val − train) gap =
    # generalization (data volume). Capped at 64 frames to bound eval cost.
    ds_tr = None
    if eval_on == "both":
        ds_tr = SyntheticMultiviewDataset(
            cfg, num_frames=min(frames, 64), is_train=False,
            image_shape=image_shape, seed=0, pose_mode=pose_mode,
            depth_cue=depth_cue)
    J = int(cfg.MODEL.NUM_JOINTS)
    rng = np.random.default_rng(11)

    def noisy_det(indices):
        """Source-space GT 2D + pixel noise for a flat index array."""
        det = np.stack([ds.records[i].joints[:, :2] for i in indices])
        det = det + rng.normal(0.0, noise_px, det.shape)
        return det.astype(np.float32)

    teacher = tstate = None
    if detector == "teacher":
        # ---- phase 1: teacher pretrain on clean single-view crops (GT 2D)
        tcfg = make_teacher_cfg(cfg)
        tmodel = get_model(tcfg)
        tstate = create_train_state(tcfg, tmodel, jax.random.PRNGKey(2),
                                    100)
        tstep = make_train_step(tcfg, tmodel, donate=False)
        tb = 16
        tbatches = [jax.device_put(b) for b in
                    ds.batches(tb, seed=0, shuffle=True, drop_last=True)]
        t0 = time.time()
        for s in range(teacher_steps):
            tstate, tm = tstep(tstate, tbatches[s % len(tbatches)])
            if (s + 1) % 100 == 0:
                # fence: thousands of unfenced async dispatches stall the
                # tunneled axon device (measured r5, dualcrop run 2)
                acc = float(tm["acc"])
                if (s + 1) % 500 == 0:
                    log(f"  teacher step {s + 1}: acc {acc:.3f}")
        acc = float(tm["acc"])
        log(f"teacher: {teacher_steps} steps, final train acc {acc:.3f} "
            f"({time.time() - t0:.0f}s)")
        teacher = Teacher(tmodel, tstate.params, tstate.batch_stats)

    # ---- phase 2: pseudo-GT floor (detections -> DLT vs GT world)
    n_floor = min(len(ds.view_groups), 16)
    batch0 = next(ds.view_batches(n_floor, shuffle=False))
    G, V = batch0["input"].shape[:2]
    flat = lambda x: x.reshape((G * V,) + x.shape[2:])
    if detector == "teacher":
        imgs = normalize_images(jnp.asarray(flat(batch0["input"])))
        j_src, conf = teacher_detect(cfg, teacher, imgs,
                                     flat(batch0["center"]),
                                     flat(batch0["scale"]))
        det = np.asarray(j_src).reshape(G, V, J, 2)
        conf = np.asarray(conf).reshape(G, V, J)
    else:
        det = noisy_det(flat(batch0["index"])).reshape(G, V, J, 2)
        conf = np.ones((G, V, J), np.float32)
    X_w, _ = generate_pseudo_gt(cfg, jnp.asarray(det), jnp.asarray(conf),
                                batch0["camera"])
    gt_w = np.stack([ds.records[ds.view_groups[t][0]].meta["pose_world"]
                     for t in range(G)])
    floor = float(np.linalg.norm(np.asarray(X_w) - gt_w, axis=-1).mean())
    log(f"pseudo-GT floor ({detector}->DLT vs GT): {floor:.1f} mm "
        f"(conf {conf.mean():.2f})")

    # ---- phase 3: SS loop, eval MPJPE curve on held-out frames
    model = get_model(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0),
                               max(len(ds.view_groups) // groups, 1))
    if merge_backbone and tstate is not None:
        # student starts from the teacher's backbone (ref 2D->3D merge)
        def merge(dst, src):
            out = dict(dst)
            for k, v in src.items():
                if k not in dst:
                    continue
                if isinstance(v, dict):
                    out[k] = merge(dst[k], v)
                elif getattr(v, "shape", None) == getattr(dst[k],
                                                          "shape", ()):
                    out[k] = v
            return out
        state = state.replace(
            params=merge(state.params, tstate.params),
            batch_stats=merge(state.batch_stats, tstate.batch_stats))

    sstep = make_ss_train_step(cfg, model, teacher, donate=False)
    estep = make_eval_step(cfg, model, flip_pairs=ds_val.flip_pairs)
    ss_batches = []
    for b in ds.view_batches(groups, seed=3, shuffle=True):
        b.pop("joints_3d", None)
        if detector == "gt_noise":
            idx = b["index"].reshape(-1)
            g, v = b["index"].shape[:2]
            b["det_src"] = noisy_det(idx).reshape(g, v, J, 2)
        ss_batches.append(jax.device_put(b))
    val_batches = [jax.device_put(b) for b in
                   ds_val.batches(8, seed=0, shuffle=False)]
    tr_batches = ([jax.device_put(b) for b in
                   ds_tr.batches(8, seed=0, shuffle=False)]
                  if ds_tr is not None else None)

    def eval_mpjpe(state, batches, dset):
        _, perf = validate(cfg, iter(batches), dset, state, estep)
        return float(perf)

    def axis_breakdown(state, batches, dset):
        """Final held-out error split into image-plane (xy) and depth (z)
        components — names the binding constraint behind the residual
        gap to the pseudo-GT floor (monocular z vs 2D localization)."""
        preds_all = []
        for b in batches:
            p = np.asarray(estep(state, b)["preds"])
            if p.ndim == 4:
                p = p.reshape(-1, *p.shape[2:])
            preds_all.append(p)
        preds = np.concatenate(preds_all)[:len(dset)]
        recs = dset.records[:len(preds)]
        ri = dset.root_idx
        gts = np.stack([r.joints_3d - r.joints_3d[ri:ri + 1]
                        for r in recs])
        pc = dset._preds_to_camera_mm(preds, recs)
        pc = pc - pc[:, ri:ri + 1]
        d = pc - gts
        return (float(np.linalg.norm(d[..., :2], axis=-1).mean()),
                float(np.abs(d[..., 2]).mean()))

    def eval_point(state):
        v = eval_mpjpe(state, val_batches, ds_val)
        t = (eval_mpjpe(state, tr_batches, ds_tr)
             if tr_batches is not None else None)
        return v, t

    def fmt(v, t):
        return (f"held-out MPJPE {v:.1f} mm" if t is None else
                f"held-out MPJPE {v:.1f} mm / train-pose {t:.1f} mm")

    v0, t0_mpjpe = eval_point(state)
    curve, curve_tr = [(0, v0)], [(0, t0_mpjpe)]
    losses = []
    log(f"step 0: student {fmt(v0, t0_mpjpe)}")
    t0 = time.time()
    for s in range(1, ss_steps + 1):
        state, m = sstep(state, ss_batches[(s - 1) % len(ss_batches)])
        if s % eval_every == 0 or s == ss_steps:
            v, t = eval_point(state)
            curve.append((s, v))
            curve_tr.append((s, t))
            losses.append((s, float(m["loss"])))
            log(f"step {s}: student {fmt(v, t)} "
                f"(loss {losses[-1][1]:.3f})")
    log(f"SS: {ss_steps} steps in {time.time() - t0:.0f}s")
    if eval_on != "train":
        xy, z = axis_breakdown(state, val_batches, ds_val)
        log(f"final held-out error split: xy {xy:.1f} mm, |z| {z:.1f} mm")

    log("")
    if tr_batches is not None:
        log("| SS step | held-out MPJPE (mm) | train-pose MPJPE (mm) |")
        log("|---|---|---|")
        for (s, v), (_, t) in zip(curve, curve_tr):
            log(f"| {s} | {v:.1f} | {t:.1f} |")
        log(f"| pseudo-GT floor | {floor:.1f} | {floor:.1f} |")
    else:
        log("| SS step | student MPJPE (mm) |")
        log("|---|---|")
        for s, v in curve:
            log(f"| {s} | {v:.1f} |")
        log(f"| pseudo-GT floor | {floor:.1f} |")
    return curve, floor, losses


def main():
    args = parse_args()
    from epipolarpose_tpu.config import config, update_config
    update_config(args.cfg)
    preset = dict(_PRESETS[args.preset])
    for k in preset:
        v = getattr(args, k if k != "val_frames" else "val_frames")
        if v is not None:
            preset[k] = v
    preset["depth_cue"] = args.depth_cue
    if args.preset == "ci":
        config.MODEL.EXTRA.NUM_LAYERS = 18
        config.MODEL.IMAGE_SIZE = [64, 64]
        config.MODEL.EXTRA.HEATMAP_SIZE = [16, 16]
        config.MODEL.EXTRA.NUM_DECONV_FILTERS = [32, 32, 32]
        config.MODEL.EXTRA.DEPTH_DIM = 4
        config.TPU.COMPUTE_DTYPE = "float32"
    from epipolarpose_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache("tools")
    import jax
    print(f"devices: {jax.devices()}")
    run(config, **preset)


if __name__ == "__main__":
    main()
