"""Epoch train / validate loops — the reference's lib/core/function.py shape.

Same observable structure (SURVEY.md §2.A [H]): AverageMeters for batch/data
time + loss + accuracy, logging every PRINT_FREQ batches, validation that
accumulates all_preds then defers to ``dataset.evaluate``. The compute
inside is the jitted fused step from :mod:`epipolarpose_tpu.core.steps`.
"""

from __future__ import annotations

import logging
import time

import numpy as np

logger = logging.getLogger(__name__)


class AverageMeter:
    """Running average (reference AverageMeter [H])."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n=1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n
        self.avg = self.sum / self.count if self.count else 0.0


def train(cfg, loader, state, train_step, epoch: int, writer=None,
          output_dir=None):
    """One training epoch. Returns (state, avg_loss)."""
    batch_time, data_time = AverageMeter(), AverageMeter()
    losses, accs = AverageMeter(), AverageMeter()
    end = time.time()
    metrics = None
    for i, batch in enumerate(loader):
        data_time.update(time.time() - end)
        state, metrics = train_step(state, batch)
        # fused-step driver (TPU.FUSED_STEPS=K): metrics carry a leading
        # (K,) axis — one dispatch covered K batches' worth of samples.
        # Detect fused by RANK, not size: a tail super-batch can hold a
        # single stacked batch (K_tail=1, loss shape (1,)) and must still
        # count input.shape[1] samples, not the scan axis.
        fused = np.ndim(metrics["loss"]) >= 1
        if fused:
            n = int(np.prod(np.shape(metrics["loss"]))) \
                * int(batch["input"].shape[1])
        else:
            n = int(batch["input"].shape[0])
        if i % int(cfg.PRINT_FREQ) == 0:
            if cfg.DEBUG.DEBUG and output_dir is not None:
                # fused super-batches carry a leading scan axis (detected
                # by metrics rank above, NOT input ndim — an unfused SS
                # multiview batch is also 5-D): dump the first scanned
                # step; multiview (still 5-D after slicing) stays skipped
                # like the pre-fused behavior.
                sl = (lambda v: np.asarray(v[0])) if fused else np.asarray
                dbg = {k: sl(v) for k, v in batch.items()
                       if k in ("input", "joints", "joints_vis")}
                if dbg["input"].ndim == 4:
                    from epipolarpose_tpu.utils.vis import save_debug_images
                    save_debug_images(cfg, dbg, None, None, None,
                                      f"{output_dir}/train_{epoch}_{i}")
            # sync only when logging so the device pipeline stays full
            # (one host materialization per metric per log line)
            loss_v = float(np.mean(np.asarray(metrics["loss"])))
            losses.update(loss_v, n)
            acc_v = None
            if "acc" in metrics:
                acc_v = float(np.mean(np.asarray(metrics["acc"])))
                accs.update(acc_v, n)
            batch_time.update(time.time() - end)
            speed = n / max(batch_time.val, 1e-9)
            msg = (f"Epoch: [{epoch}][{i}]\t"
                   f"Time {batch_time.val:.3f}s ({speed:.1f} samples/s)\t"
                   f"Data {data_time.val:.3f}s\t"
                   f"Loss {losses.val:.5f} ({losses.avg:.5f})")
            if "acc" in metrics:
                msg += f"\tAccuracy {accs.val:.3f} ({accs.avg:.3f})"
            logger.info(msg)
            if writer is not None:
                writer.write_scalars(int(state.step), {
                    "train/loss": loss_v,
                    **({"train/acc": acc_v} if acc_v is not None else {})})
        end = time.time()
    if metrics is not None and losses.count == 0:
        losses.update(float(np.mean(np.asarray(metrics["loss"]))))
    return state, losses.avg


def validate(cfg, loader, dataset, state, eval_step, writer=None,
             output_dir=None):
    """Full validation pass -> dataset.evaluate (reference validate [H]).

    Returns (name_values, perf_indicator).
    """
    def fetch(x):
        """Host-materialize an array that may be sharded across hosts.

        Single-host (and replicated outputs): plain np.asarray. On pod runs
        the loader's batch arrays are data-sharded across processes, so a
        tiled all-gather is needed before host use (eval-step OUTPUTS are
        replicated by out_shardings and need no gather)."""
        import jax
        if jax.process_count() > 1 and hasattr(x, "is_fully_addressable") \
                and not x.is_fully_addressable:
            from jax.experimental import multihost_utils
            return np.asarray(
                multihost_utils.process_allgather(x, tiled=True))
        return np.asarray(x)

    all_preds = []
    all_boxes = []
    n_seen = 0
    end = time.time()
    for batch in loader:
        out = eval_step(state, batch)
        preds = fetch(out["preds"])
        c = fetch(batch["center"])
        s = fetch(batch["scale"])
        if preds.ndim == 4:      # fused eval super-batch: (K, bs, J, C)
            preds = preds.reshape(-1, *preds.shape[2:])
            c = c.reshape(-1, c.shape[-1])
            s = s.reshape(-1, s.shape[-1])
        all_preds.append(preds)
        all_boxes.append(np.concatenate(
            [c, s, np.prod(s * 200, axis=-1, keepdims=True)], axis=-1))
        n_seen += preds.shape[0]
    total = time.time() - end
    preds = np.concatenate(all_preds)[:len(dataset)]
    logger.info(f"validate: {n_seen} samples in {total:.1f}s "
                f"({n_seen / max(total, 1e-9):.1f} samples/s)")
    if output_dir:
        # reference behavior: persist raw predictions next to the metrics
        # (pred.mat via scipy in the reference; .npz here + .mat when scipy
        # is present) for offline analysis / MPII test-server submission
        import os
        np.savez(os.path.join(output_dir, "pred.npz"), preds=preds,
                 boxes=np.concatenate(all_boxes)[:len(dataset)])
        try:
            from scipy.io import savemat
            savemat(os.path.join(output_dir, "pred.mat"),
                    {"preds": preds})
        except Exception:
            pass
    name_values, perf = dataset.evaluate(cfg, preds, output_dir)
    if isinstance(name_values, dict):
        _print_name_value(name_values, cfg.MODEL.NAME)
    if writer is not None:
        writer.write_scalars(int(state.step),
                             {"valid/perf": float(perf)})
    return name_values, perf


def _print_name_value(name_value: dict, full_arch_name: str):
    """Reference's markdown metric table logging [H]."""
    names = list(name_value.keys())
    values = list(name_value.values())
    logger.info("| Arch " + " ".join(f"| {n}" for n in names) + " |")
    logger.info("|---" * (len(names) + 1) + "|")
    logger.info(f"| {full_arch_name} "
                + " ".join(f"| {v:.3f}" for v in values) + " |")
