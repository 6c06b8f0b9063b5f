#!/usr/bin/env python
"""Dual-crop SS loader headroom: half-res teacher crop, measured
(VERDICT r3 weak #5 / next #8; results table in docs/PROFILE_r4.md).

The SS input path decodes each frame once and warps twice (clean teacher
crop + augmented student crop). The teacher only feeds a heatmap argmax,
so its crop can shrink: TPU.SS_TEACHER_SCALE=0.5 quarters the teacher
half's warp pixels and host->device bytes, and (on-device) the frozen
teacher forward runs on 1/4 the pixels. This script measures all three
sides of the trade:

  A. host loader throughput, scale 1.0 vs 0.5 (native dual-crop path);
  B. pseudo-GT quality: a teacher trained at full res evaluated on
     full-res vs half-res clean crops (argmax quantization + scale shift),
     plus a teacher fine-tuned at half res;
  C. on-device fused SS step throughput at both scales.

    python tools/dualcrop_headroom.py                # chip scale (r50@256)
    python tools/dualcrop_headroom.py --preset ci    # r18@64, CPU-fast
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", default="experiments/h36m/"
                   "train_ss_r50_256_integral.yaml")
    p.add_argument("--preset", choices=["chip", "ci"], default="chip")
    return p.parse_args()


_PRESETS = {
    # teacher_steps=3000: the 600-step teacher (train acc 0.125) puts the
    # pseudo-GT floor at ~500 mm of TEACHER error, swamping the few-mm
    # half-res quantization effect this tool exists to measure (r5 run 1);
    # ss_convergence's chip preset reaches acc 1.000 / 25 mm floor at 3000
    "chip": dict(frames=48, loader_frames=32, groups=8,
                 teacher_steps=3000, finetune_steps=600, dev_iters=6),
    "ci": dict(frames=12, loader_frames=12, groups=4,
               teacher_steps=150, finetune_steps=60, dev_iters=2),
}


def bench_loader(cfg, td, n_frames, groups, log):
    """A: host dual-crop loader img/s (student images counted), both
    scales through the SAME dataset/tree."""
    import epipolarpose_tpu.data.h36m as h36m_mod
    from epipolarpose_tpu.data.h36m import H36MDataset
    from epipolarpose_tpu.data.synthetic import write_synthetic_h36m
    sub = cfg.DATASET.SUBSAMPLE
    cfg.DATASET.SUBSAMPLE = 1
    root = os.path.join(td, "tree")
    write_synthetic_h36m(root, cfg, num_frames=n_frames)
    orig = h36m_mod.CAMERA_IDS
    h36m_mod.CAMERA_IDS = ("0", "1", "2", "3")
    out = {}
    try:
        cfg.TPU.NATIVE_LOADER = True
        ds = H36MDataset(cfg, root, "train", is_train=True)
        for scale in (1.0, 0.5):
            cfg.TPU.SS_TEACHER_SCALE = scale
            # warm (decoder caches, page cache)
            for b in ds.view_batches(groups, seed=0, shuffle=False,
                                     augment=True):
                pass
            n_img = 0
            byts = 0
            t0 = time.time()
            for rep in range(3):
                for b in ds.view_batches(groups, seed=rep, shuffle=True,
                                         augment=True):
                    n_img += b["input_aug"].shape[0] * b["input_aug"].shape[1]
                    byts += b["input"].nbytes + b["input_aug"].nbytes
            dt = time.time() - t0
            out[scale] = dict(img_s=round(n_img / dt, 1),
                              bytes_per_img=round(byts / n_img))
            log(f"A loader scale={scale}: {out[scale]['img_s']} img/s, "
                f"{out[scale]['bytes_per_img']} B/img shipped")
    finally:
        h36m_mod.CAMERA_IDS = orig
        cfg.TPU.NATIVE_LOADER = "auto"
        cfg.TPU.SS_TEACHER_SCALE = 1.0
        cfg.DATASET.SUBSAMPLE = sub
    return out


def bench_quality_and_device(cfg, frames, groups, teacher_steps,
                             finetune_steps, dev_iters, log):
    """B+C: pseudo-GT floor + on-device SS step rate at both scales."""
    import jax
    import jax.numpy as jnp
    from epipolarpose_tpu.core import create_train_state, make_train_step
    from epipolarpose_tpu.core.self_supervised import (
        Teacher, generate_pseudo_gt, make_ss_train_step, teacher_detect)
    from epipolarpose_tpu.core.steps import normalize_images
    from epipolarpose_tpu.data import SyntheticMultiviewDataset
    from epipolarpose_tpu.models import get_model
    from ss_convergence import make_teacher_cfg

    image_shape = tuple(int(v) for v in cfg.MODEL.IMAGE_SIZE)
    ds = SyntheticMultiviewDataset(cfg, num_frames=frames, is_train=True,
                                   image_shape=image_shape, seed=0)
    J = int(cfg.MODEL.NUM_JOINTS)

    # teacher pretrained on FULL-res clean crops (the MPII-pretrain twin)
    tcfg = make_teacher_cfg(cfg)
    tmodel = get_model(tcfg)
    tstate = create_train_state(tcfg, tmodel, jax.random.PRNGKey(2), 100)
    tstep = make_train_step(tcfg, tmodel, donate=False)
    tb = 16
    tbatches = [jax.device_put(b) for b in
                ds.batches(tb, seed=0, shuffle=True, drop_last=True)]
    for s in range(teacher_steps):
        tstate, tm = tstep(tstate, tbatches[s % len(tbatches)])
        if (s + 1) % 100 == 0:
            # bound the dispatch backlog: thousands of unfenced async
            # dispatches stall the tunneled axon device (measured r5:
            # 3000-step loop froze 19+ min with zero progress; fenced
            # every 100 it completes normally)
            _ = float(tm["acc"])
    log(f"B teacher: {teacher_steps} steps, train acc "
        f"{float(tm['acc']):.3f}")
    teacher = Teacher(tmodel, tstate.params, tstate.batch_stats)

    def floor(scale, tchr):
        """Pseudo-GT MPJPE with clean crops at `scale` via the REAL
        dataset path (SS_TEACHER_SCALE) -> teacher -> DLT vs GT world."""
        cfg.TPU.SS_TEACHER_SCALE = scale
        try:
            n_floor = min(len(ds.view_groups), 16)
            batch0 = next(ds.view_batches(n_floor, shuffle=False,
                                          augment=(scale != 1.0)))
            G, V = batch0["input"].shape[:2]
            flat = lambda x: x.reshape((G * V,) + x.shape[2:])
            imgs = normalize_images(jnp.asarray(flat(batch0["input"])))
            j_src, conf = teacher_detect(cfg, tchr, imgs,
                                         flat(batch0["center"]),
                                         flat(batch0["scale"]))
            det = np.asarray(j_src).reshape(G, V, J, 2)
            conf = np.asarray(conf).reshape(G, V, J)
            X_w, _ = generate_pseudo_gt(cfg, jnp.asarray(det),
                                        jnp.asarray(conf),
                                        batch0["camera"])
            gt_w = np.stack(
                [ds.records[ds.view_groups[t][0]].meta["pose_world"]
                 for t in range(G)])
            err = np.linalg.norm(np.asarray(X_w) - gt_w, axis=-1)
            # degenerate triangulations (weak teacher off-distribution)
            # come back nan; the SS step zero-weights them (nan-mask) —
            # report the mean over the finite ones + the finite fraction
            finite = np.isfinite(err)
            if not finite.any():
                return float("nan")
            frac = finite.mean()
            if frac < 1.0:
                log(f"   ({(1 - frac) * 100:.0f}% joints degenerate/nan "
                    f"at this operating point)")
            return float(err[finite].mean())
        finally:
            cfg.TPU.SS_TEACHER_SCALE = 1.0

    f_full = floor(1.0, teacher)
    f_half = floor(0.5, teacher)
    log(f"B pseudo-GT floor: full-res {f_full:.1f} mm, half-res "
        f"{f_half:.1f} mm (same weights)")

    # fine-tune the teacher ON half-res crops (scale-shift adaptation):
    # same full-res source images, crops + gaussian targets at half size
    tcfg_h = make_teacher_cfg(cfg)
    tcfg_h.MODEL.IMAGE_SIZE = [image_shape[0] // 2, image_shape[1] // 2]
    tcfg_h.MODEL.EXTRA.HEATMAP_SIZE = [
        int(v) // 2 for v in tcfg_h.MODEL.EXTRA.HEATMAP_SIZE]
    ds_ft = SyntheticMultiviewDataset(
        tcfg_h, num_frames=frames, is_train=True,
        image_shape=image_shape, seed=0)
    ftstate = tstate
    ftstep = make_train_step(tcfg_h, tmodel, donate=False)
    ftb = [jax.device_put(b) for b in
           ds_ft.batches(tb, seed=7, shuffle=True, drop_last=True)]
    for s in range(finetune_steps):
        ftstate, ftm = ftstep(ftstate, ftb[s % len(ftb)])
        if (s + 1) % 100 == 0:
            _ = float(ftm["acc"])        # bound the dispatch backlog
    teacher_ft = Teacher(tmodel, ftstate.params, ftstate.batch_stats)
    f_half_ft = floor(0.5, teacher_ft)
    log(f"B pseudo-GT floor: half-res after {finetune_steps}-step "
        f"fine-tune {f_half_ft:.1f} mm")

    # C: on-device fused SS step throughput at both scales
    model = get_model(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), 100)
    rates = {}
    for scale in (1.0, 0.5):
        cfg.TPU.SS_TEACHER_SCALE = scale
        try:
            batch = next(ds.view_batches(groups, seed=1, shuffle=True,
                                         augment=True))
            batch.pop("joints_3d", None)
            dev = jax.device_put(batch)
            sstep = make_ss_train_step(
                cfg, model, teacher if scale == 1.0 else teacher_ft,
                donate=False, flip_pairs=ds.flip_pairs)
            st, m = sstep(state, dev)            # compile + warm
            _ = float(m["loss"])
            t0 = time.time()
            for _ in range(dev_iters):
                st, m = sstep(state, dev)
            _ = float(m["loss"])
            n = dev_iters * batch["input_aug"].shape[0] * \
                batch["input_aug"].shape[1]
            rates[scale] = round(n / (time.time() - t0), 1)
            log(f"C device SS step scale={scale}: {rates[scale]} img/s")
        finally:
            cfg.TPU.SS_TEACHER_SCALE = 1.0
    return dict(floor_full=f_full, floor_half=f_half,
                floor_half_ft=f_half_ft, device=rates)


def main():
    args = parse_args()
    from epipolarpose_tpu.config import config, update_config
    update_config(args.cfg)
    preset = dict(_PRESETS[args.preset])
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
    with tempfile.TemporaryDirectory() as td:
        A = bench_loader(config, td, preset["loader_frames"],
                         preset["groups"], print)
    B = bench_quality_and_device(
        config, preset["frames"], preset["groups"],
        preset["teacher_steps"], preset["finetune_steps"],
        preset["dev_iters"], print)
    print()
    print("| measure | scale 1.0 | scale 0.5 |")
    print("|---|---|---|")
    print(f"| host loader (img/s) | {A[1.0]['img_s']} | "
          f"{A[0.5]['img_s']} |")
    print(f"| shipped bytes/img | {A[1.0]['bytes_per_img']} | "
          f"{A[0.5]['bytes_per_img']} |")
    print(f"| pseudo-GT floor (mm) | {B['floor_full']:.1f} | "
          f"{B['floor_half']:.1f} (same weights) / "
          f"{B['floor_half_ft']:.1f} (fine-tuned) |")
    print(f"| device SS step (img/s) | {B['device'][1.0]} | "
          f"{B['device'][0.5]} |")


if __name__ == "__main__":
    main()
