"""Training losses mirroring lib/core/loss.py (SURVEY.md §2.A [H]/[M]).

- ``joints_mse_loss``: JointsMSELoss — 0.5 * MSE per joint on heatmaps,
  optionally masked by target_weight, averaged over joints.
- ``integral_l1_loss``: L1 on soft-argmax coordinates vs normalized targets,
  weighted per joint (integral-human-pose lineage).
"""

from __future__ import annotations

import jax.numpy as jnp


def joints_mse_loss(output, target, target_weight=None,
                    use_target_weight: bool = True):
    """Heatmap MSE. output/target: (N, H, W, J) NHWC; target_weight: (N, J).

    Matches the reference: per-joint 0.5*mean((w*pred - w*gt)^2) over the
    flattened heatmap and batch, then the mean over joints.
    """
    n, h, w, j = output.shape
    pred = jnp.moveaxis(output.astype(jnp.float32), -1, 1).reshape(n, j,
                                                                   h * w)
    gt = jnp.moveaxis(target.astype(jnp.float32), -1, 1).reshape(n, j,
                                                                 h * w)
    if use_target_weight and target_weight is not None:
        tw = target_weight[..., None]
        pred = pred * tw
        gt = gt * tw
    per_joint = 0.5 * jnp.mean((pred - gt) ** 2, axis=(0, 2))
    return jnp.mean(per_joint)


def integral_l1_loss(pred_coords, target_coords, target_weight=None):
    """L1 joint-location loss on normalized (x, y, z) coords.

    pred/target: (N, J, 3); target_weight: (N, J) or (N, J, 3).
    sum(|err|·w) / N — the integral-human-pose ``weighted_l1_loss`` with
    ``size_average`` divides by the BATCH size, not the weighted-coordinate
    count [M]; matching it keeps loss magnitudes (and the published
    LR recipe, which is not scale-free under SGD) transferable.
    """
    err = jnp.abs(pred_coords - target_coords)
    n = jnp.maximum(err.shape[0], 1)
    if target_weight is not None:
        if target_weight.ndim == err.ndim - 1:
            target_weight = target_weight[..., None]
        # where() (not multiply) so nan/inf targets under zero weight stay
        # masked — 0 * nan would poison the loss (degenerate pseudo-GT)
        err = jnp.where(target_weight > 0, err * target_weight, 0.0)
    return jnp.sum(err) / n


def make_loss(cfg):
    """Loss factory from config (LOSS.TYPE), mirroring the reference's
    criterion construction in scripts/train.py."""
    use_tw = bool(cfg.LOSS.USE_TARGET_WEIGHT)
    if cfg.LOSS.TYPE == "JointsMSELoss":
        def criterion(output, target, target_weight):
            return joints_mse_loss(output, target, target_weight, use_tw)
        return criterion
    if cfg.LOSS.TYPE == "IntegralL1Loss":
        def criterion(output, target, target_weight):
            return integral_l1_loss(output, target,
                                    target_weight if use_tw else None)
        return criterion
    raise ValueError(f"unknown LOSS.TYPE: {cfg.LOSS.TYPE}")
