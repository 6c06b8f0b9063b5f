"""Debug visualization (reference lib/utils/vis.py [H]).

``save_debug_images`` writes gt/pred joint overlays and heatmap grids,
gated by the DEBUG.* config flags, exactly like the reference's per-batch
dumps. Host-side PIL/numpy only — no GUI dependencies.
"""

from __future__ import annotations

import math
import os

import numpy as np

from epipolarpose_tpu.data.joints_dataset import IMAGENET_MEAN, IMAGENET_STD


def _to_uint8(images):
    """(N, H, W, 3) uint8, [0,1] float, or ImageNet-normalized -> uint8."""
    if np.issubdtype(np.asarray(images).dtype, np.integer):
        return np.asarray(images, np.uint8)
    imgs = np.asarray(images, np.float32)
    # [0,1] floats are never negative; ANY negative value (or values well
    # above 1) means ImageNet-normalized. The old `min < -0.5` heuristic
    # misclassified bright normalized crops (min ~ -0.37) as [0,1].
    if imgs.min() < -1e-3 or imgs.max() > 1.5:
        imgs = imgs * IMAGENET_STD + IMAGENET_MEAN
    return np.clip(imgs * 255.0, 0, 255).astype(np.uint8)


def save_batch_image_with_joints(batch_image, batch_joints,
                                 batch_joints_vis, file_name, nrow=8,
                                 padding=2):
    """Grid of images with joints drawn (reference function [H])."""
    import cv2
    imgs = _to_uint8(batch_image)
    N, H, W, _ = imgs.shape
    nrow = min(nrow, N)
    ncol = math.ceil(N / nrow)
    grid = np.zeros((ncol * (H + padding), nrow * (W + padding), 3),
                    np.uint8)
    joints = np.asarray(batch_joints)
    vis = np.asarray(batch_joints_vis).reshape(N, -1)
    for n in range(N):
        r, c = divmod(n, nrow)
        img = imgs[n].copy()
        for j, (x, y) in enumerate(joints[n][:, :2]):
            if vis[n][j] > 0 and 0 <= x < W and 0 <= y < H:
                cv2.circle(img, (int(x), int(y)), 2, (255, 0, 0), 2)
        grid[r * (H + padding):r * (H + padding) + H,
             c * (W + padding):c * (W + padding) + W] = img
    cv2.imwrite(file_name, cv2.cvtColor(grid, cv2.COLOR_RGB2BGR))


def save_batch_heatmaps(batch_image, batch_heatmaps, file_name,
                        normalize=True):
    """Image | per-joint heatmap strip, one row per sample (reference [H])."""
    import cv2
    imgs = _to_uint8(batch_image)
    hms = np.asarray(batch_heatmaps, np.float32)
    N, hh, hw, J = hms.shape
    out = np.zeros((N * hh, (J + 1) * hw, 3), np.uint8)
    for n in range(N):
        img_small = cv2.resize(imgs[n], (hw, hh))
        out[n * hh:(n + 1) * hh, :hw] = img_small
        for j in range(J):
            hm = hms[n, :, :, j]
            if normalize:
                mn, mx = hm.min(), hm.max()
                hm = (hm - mn) / (mx - mn + 1e-9)
            colored = cv2.applyColorMap((hm * 255).astype(np.uint8),
                                        cv2.COLORMAP_JET)
            colored = cv2.cvtColor(colored, cv2.COLOR_BGR2RGB)
            blend = (colored * 0.7 + img_small * 0.3).astype(np.uint8)
            out[n * hh:(n + 1) * hh, (j + 1) * hw:(j + 2) * hw] = blend
    cv2.imwrite(file_name, cv2.cvtColor(out, cv2.COLOR_RGB2BGR))


def save_debug_images(config, batch, target, output, preds, prefix):
    """Reference save_debug_images: gt/pred joints + gt/pred heatmaps,
    gated on DEBUG.* flags [H]."""
    if not config.DEBUG.DEBUG:
        return
    os.makedirs(os.path.dirname(prefix) or ".", exist_ok=True)
    imgs = np.asarray(batch["input"])
    if config.DEBUG.SAVE_BATCH_IMAGES_GT:
        save_batch_image_with_joints(
            imgs, np.asarray(batch["joints"]),
            np.asarray(batch["joints_vis"]), f"{prefix}_gt.jpg")
    if config.DEBUG.SAVE_BATCH_IMAGES_PRED and preds is not None:
        save_batch_image_with_joints(
            imgs, np.asarray(preds),
            np.ones_like(np.asarray(batch["joints_vis"])),
            f"{prefix}_pred.jpg")
    if config.DEBUG.SAVE_HEATMAPS_GT and target is not None \
            and np.asarray(target).ndim == 4:
        save_batch_heatmaps(imgs, np.asarray(target),
                            f"{prefix}_hm_gt.jpg")
    if config.DEBUG.SAVE_HEATMAPS_PRED and output is not None \
            and np.asarray(output).ndim == 4:
        save_batch_heatmaps(imgs, np.asarray(output, np.float32),
                            f"{prefix}_hm_pred.jpg")


# H36M 17-joint skeleton edges for 3D plots
H36M_EDGES = ((0, 1), (1, 2), (2, 3), (0, 4), (4, 5), (5, 6), (0, 7),
              (7, 8), (8, 9), (9, 10), (8, 11), (11, 12), (12, 13),
              (8, 14), (14, 15), (15, 16))


def plot_3d_skeleton(pose3d, file_name, edges=H36M_EDGES, title=""):
    """Matplotlib 3D skeleton render (demo.ipynb flow, SURVEY §3.5 [M])."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    pose = np.asarray(pose3d)
    fig = plt.figure(figsize=(5, 5))
    ax = fig.add_subplot(111, projection="3d")
    for a, b in edges:
        if a < len(pose) and b < len(pose):
            ax.plot([pose[a, 0], pose[b, 0]],
                    [pose[a, 2], pose[b, 2]],
                    [-pose[a, 1], -pose[b, 1]], "b-o", markersize=3)
    ax.set_title(title)
    ax.set_box_aspect((1, 1, 1))
    fig.savefig(file_name, dpi=100, bbox_inches="tight")
    plt.close(fig)
