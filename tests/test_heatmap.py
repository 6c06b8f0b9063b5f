"""Heatmap target generation + decode vs a numpy oracle of the reference
algorithm (JointsDataset.generate_target / lib/core/inference.py)."""

import numpy as np

from epipolarpose_tpu.ops import (
    generate_target, get_final_preds, get_max_preds,
)
from epipolarpose_tpu.ops.heatmap import post_process_preds


def oracle_generate_target(joints, joints_vis, heatmap_size, sigma,
                           image_size):
    """Direct numpy port of the documented reference algorithm (oracle)."""
    W, H = heatmap_size
    J = joints.shape[0]
    target_weight = joints_vis[:, 0].copy().astype(np.float32) \
        if joints_vis.ndim == 2 else joints_vis.copy().astype(np.float32)
    target = np.zeros((J, H, W), np.float32)
    stride = (image_size[0] / W, image_size[1] / H)
    tmp_size = sigma * 3
    for j in range(J):
        mu_x = int(joints[j][0] / stride[0] + 0.5)
        mu_y = int(joints[j][1] / stride[1] + 0.5)
        ul = [int(mu_x - tmp_size), int(mu_y - tmp_size)]
        br = [int(mu_x + tmp_size + 1), int(mu_y + tmp_size + 1)]
        if ul[0] >= W or ul[1] >= H or br[0] < 0 or br[1] < 0:
            target_weight[j] = 0
            continue
        size = 2 * tmp_size + 1
        x = np.arange(0, size, 1, np.float32)
        y = x[:, None]
        x0 = y0 = size // 2
        g = np.exp(-((x - x0) ** 2 + (y - y0) ** 2) / (2 * sigma ** 2))
        g_x = max(0, -ul[0]), min(br[0], W) - ul[0]
        g_y = max(0, -ul[1]), min(br[1], H) - ul[1]
        img_x = max(0, ul[0]), min(br[0], W)
        img_y = max(0, ul[1]), min(br[1], H)
        if target_weight[j] > 0.5:
            target[j][img_y[0]:img_y[1], img_x[0]:img_x[1]] = \
                g[g_y[0]:g_y[1], g_x[0]:g_x[1]]
    return target, target_weight


def test_matches_reference_oracle(rng):
    J = 16
    joints = rng.uniform(-20, 276, (J, 2)).astype(np.float32)
    vis = (rng.uniform(size=(J, 1)) > 0.2).astype(np.float32)
    ours_t, ours_w = generate_target(joints, vis[:, 0], (64, 64), 2,
                                     (256, 256))
    oracle_t, oracle_w = oracle_generate_target(joints, vis, (64, 64), 2,
                                                (256, 256))
    np.testing.assert_allclose(np.asarray(ours_w), oracle_w)
    # ours is NHWC-style (H, W, J); oracle (J, H, W)
    np.testing.assert_allclose(np.moveaxis(np.asarray(ours_t), -1, 0),
                               oracle_t, atol=1e-5)


def test_batched_target(rng):
    # keep quantized centers strictly on the 64-grid (mu = trunc(j/4+.5) ≤ 63)
    joints = rng.uniform(0, 252, (4, 16, 2)).astype(np.float32)
    vis = np.ones((4, 16), np.float32)
    t, w = generate_target(joints, vis, (64, 64), 2, (256, 256))
    assert np.asarray(t).shape == (4, 64, 64, 16)
    assert np.asarray(w).shape == (4, 16)
    # peak is at the quantized joint location
    tj = np.asarray(t)
    for n in range(4):
        for j in range(16):
            peak = np.unravel_index(np.argmax(tj[n, :, :, j]), (64, 64))
            mu = np.floor(joints[n, j] / 4 + 0.5)
            assert peak[1] == mu[0] and peak[0] == mu[1]


def test_get_max_preds(rng):
    hm = np.zeros((2, 64, 64, 3), np.float32)
    gt = np.array([[[10, 20], [33, 5], [63, 63]],
                   [[0, 0], [31, 32], [1, 62]]], np.float32)
    for n in range(2):
        for j in range(3):
            hm[n, int(gt[n, j, 1]), int(gt[n, j, 0]), j] = 1.0
    preds, maxvals = get_max_preds(hm)
    np.testing.assert_allclose(np.asarray(preds), gt)
    np.testing.assert_allclose(np.asarray(maxvals), 1.0)


def test_quarter_offset_shifts_toward_neighbor():
    hm = np.zeros((1, 64, 64, 1), np.float32)
    hm[0, 20, 30, 0] = 1.0
    hm[0, 20, 31, 0] = 0.5     # pull +x
    hm[0, 19, 30, 0] = 0.3     # pull -y
    preds, _ = get_max_preds(hm)
    out = np.asarray(post_process_preds(hm, preds))
    np.testing.assert_allclose(out[0, 0], [30.25, 19.75])


def test_final_preds_identity_crop():
    # center crop covering exactly the heatmap-scaled region:
    # scale*200 = 256 px box at center (128, 128) -> identity-ish mapping
    hm = np.zeros((1, 64, 64, 1), np.float32)
    hm[0, 16, 48, 0] = 1.0
    center = np.array([[128.0, 128.0]], np.float32)
    scale = np.array([[1.28, 1.28]], np.float32)
    preds, _ = get_final_preds(hm, center, scale, post_process=False)
    # heatmap (48, 16) * 4 = image-space (192, 64)... via the affine map
    np.testing.assert_allclose(np.asarray(preds)[0, 0], [194.0, 66.0],
                               atol=2.5)
