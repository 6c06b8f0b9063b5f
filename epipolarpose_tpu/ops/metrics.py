"""Evaluation metrics: PCK/PCKh (2D), MPJPE family + PSS (3D).

Reference lineage (SURVEY.md §2.A): lib/core/evaluate.py (train-time heatmap
PCK [H]), lib/dataset/mpii.py (PCKh@0.5 [H]), lib/dataset/h36m.py (MPJPE /
NMPJPE / PA-MPJPE, PSS@{50,100} [M]). All batched jnp.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from epipolarpose_tpu.ops.heatmap import get_max_preds
from epipolarpose_tpu.geometry.procrustes import procrustes_align


def _calc_dists(preds, target, normalize):
    """Normalized distances; -1 where target is invalid (reference calc_dists).

    preds/target: (N, J, 2); normalize: (N,) or (N, 2). Returns (N, J).
    """
    if normalize.ndim == 1:
        normalize = normalize[:, None]
    valid = (target[..., 0] > 1) & (target[..., 1] > 1)
    d = jnp.linalg.norm((preds - target) / normalize[:, None, :], axis=-1)
    return jnp.where(valid, d, -1.0)


def _dist_acc(dists, thr=0.5):
    """Fraction below threshold among valid; -1 if no valid (dist_acc [H])."""
    valid = dists != -1
    n = valid.sum(axis=0)
    hit = ((dists < thr) & valid).sum(axis=0)
    return jnp.where(n > 0, hit / jnp.maximum(n, 1), -1.0)


def heatmap_accuracy(output, target, thr: float = 0.5):
    """Train-time PCK on the heatmap grid (reference ``accuracy`` [H]).

    output/target: (N, H, W, J) NHWC. Normalizer: heatmap size / 10.
    Returns (per_joint_acc (J,), avg_acc (), cnt, pred_coords).
    """
    h, w = output.shape[-3], output.shape[-2]
    pred, _ = get_max_preds(output)
    gt, _ = get_max_preds(target)
    # reference builds norm = [h, w]/10 against (x, y) coords — i.e. x is
    # divided by h/10 (identical for the square heatmaps every config
    # ships, but kept exact for parity)
    norm = jnp.ones((output.shape[0], 2), output.dtype) * \
        jnp.asarray([h, w], output.dtype) / 10.0
    dists = _calc_dists(pred, gt, norm)
    acc = _dist_acc(dists, thr)
    valid_joint = acc >= 0
    avg = jnp.sum(jnp.where(valid_joint, acc, 0.0)) / \
        jnp.maximum(valid_joint.sum(), 1)
    return acc, avg, valid_joint.sum(), pred


def pck(preds, target, normalize, thr: float = 0.5):
    """Generic PCK@thr with external normalizer (N,) or (N, 2)."""
    dists = _calc_dists(preds, target, normalize)
    return _dist_acc(dists, thr)


def pckh(preds, target, headsizes, joints_vis=None, thr: float = 0.5):
    """PCKh@thr: distance normalized by per-sample head segment length.

    preds/target: (N, J, 2); headsizes: (N,). Returns (per_joint, mean).
    """
    d = jnp.linalg.norm(preds - target, axis=-1) / headsizes[:, None]
    if joints_vis is None:
        valid = jnp.ones(d.shape, bool)
    else:
        valid = joints_vis > 0
    hit = ((d <= thr) & valid).sum(axis=0)
    n = valid.sum(axis=0)
    per_joint = jnp.where(n > 0, hit / jnp.maximum(n, 1), 0.0) * 100.0
    mean = 100.0 * ((d <= thr) & valid).sum() / jnp.maximum(valid.sum(), 1)
    return per_joint, mean


def mpjpe(pred, gt, joints_vis=None):
    """Mean per-joint position error (mm). pred/gt: (N, J, 3)."""
    d = jnp.linalg.norm(pred - gt, axis=-1)
    if joints_vis is not None:
        w = (joints_vis > 0)
        return jnp.sum(d * w) / jnp.maximum(w.sum(), 1)
    return jnp.mean(d)


def nmpjpe(pred, gt, joints_vis=None):
    """Scale-normalized MPJPE: optimal per-sample scale before MPJPE."""
    num = jnp.sum(pred * gt, axis=(-1, -2), keepdims=True)
    den = jnp.sum(pred * pred, axis=(-1, -2), keepdims=True)
    s = num / jnp.where(den < 1e-12, 1e-12, den)
    return mpjpe(s * pred, gt, joints_vis)


def pa_mpjpe(pred, gt, joints_vis=None):
    """Procrustes-aligned MPJPE (protocol 2)."""
    return mpjpe(procrustes_align(pred, gt), gt, joints_vis)


def kmeans(key, points, k: int, iters: int = 20):
    """Plain k-means in jnp with a static iteration count (for PSS).

    points: (N, D). Returns (centers (k, D), assignment (N,)).
    """
    n = points.shape[0]
    if n < k:
        raise ValueError(f"kmeans needs at least k={k} points, got {n}")
    init = jax.random.choice(key, n, (k,), replace=False)
    centers = points[init]

    def step(centers, _):
        d = jnp.linalg.norm(points[:, None, :] - centers[None], axis=-1)
        assign = jnp.argmin(d, axis=-1)
        one_hot = jax.nn.one_hot(assign, k, dtype=points.dtype)
        counts = one_hot.sum(axis=0)
        sums = one_hot.T @ points
        new = sums / jnp.maximum(counts[:, None], 1.0)
        centers = jnp.where(counts[:, None] > 0, new, centers)
        return centers, None

    centers, _ = jax.lax.scan(step, centers, None, length=iters)
    d = jnp.linalg.norm(points[:, None, :] - centers[None], axis=-1)
    return centers, jnp.argmin(d, axis=-1)


# bump whenever _pose_embed's definition changes: persisted PSS-center
# caches (h36m.pss_centers) key on this so centers fit under an older
# embedding are ignored instead of silently skewing PSS (v2 = the round-2
# switch from mean-centering to root-centering)
PSS_EMBED_VERSION = 2


def _pose_embed(poses, root_idx: int = 0):
    """Root-center + unit-norm flatten, the pose rep used by PSS [M]
    (root joint = index 0 in the H36M order, matching the root-relative
    convention the rest of the eval pipeline uses)."""
    x = poses - poses[..., root_idx:root_idx + 1, :]
    x = x.reshape(x.shape[:-2] + (-1,))
    return x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)


def pss(pred, gt, centers):
    """Pose Structure Score (paper's PSS@k metric [M]).

    Assign pred and gt poses to the nearest of ``centers`` (k-means centers
    fit on GT poses via :func:`kmeans` over :func:`_pose_embed` embeddings);
    PSS = fraction assigned to the same cluster.
    """
    pe = _pose_embed(pred)
    ge = _pose_embed(gt)
    ap = jnp.argmin(jnp.linalg.norm(pe[:, None] - centers[None], axis=-1), -1)
    ag = jnp.argmin(jnp.linalg.norm(ge[:, None] - centers[None], axis=-1), -1)
    return jnp.mean((ap == ag).astype(jnp.float32))


def fit_pss_centers(key, gt_poses, k: int = 50, iters: int = 20):
    """Fit PSS cluster centers on GT poses (k ∈ {50, 100} in the paper)."""
    centers, _ = kmeans(key, _pose_embed(gt_poses), k, iters)
    return centers


def pck3d(pred, gt, thresh_mm: float = 150.0):
    """3D PCK@thresh (MPI-INF-3DHP transfer protocol [L]): fraction of
    joints within ``thresh_mm`` of GT. pred/gt: (N, J, 3) root-relative mm.
    """
    d = jnp.linalg.norm(pred - gt, axis=-1)
    return 100.0 * jnp.mean((d < thresh_mm).astype(jnp.float32))


def auc3d(pred, gt, max_thresh_mm: float = 150.0, steps: int = 30):
    """Area under the 3D-PCK curve over [0, max_thresh] (3DHP AUC)."""
    d = jnp.linalg.norm(pred - gt, axis=-1)
    ts = jnp.linspace(max_thresh_mm / steps, max_thresh_mm, steps)
    curve = jnp.mean((d[..., None] < ts).astype(jnp.float32), axis=(0, 1))
    return 100.0 * jnp.mean(curve)
