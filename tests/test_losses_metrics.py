"""Losses + metrics vs torch / closed-form oracles."""

import numpy as np
import pytest

from epipolarpose_tpu.config import load_config, reset_config, config
from epipolarpose_tpu.ops import (
    heatmap_accuracy, integral_l1_loss, joints_mse_loss, make_loss, mpjpe,
    nmpjpe, pa_mpjpe, pckh, pss,
)
from epipolarpose_tpu.ops.metrics import fit_pss_centers


def test_joints_mse_matches_torch(rng):
    import torch
    N, H, W, J = 4, 16, 16, 5
    out = rng.standard_normal((N, H, W, J)).astype(np.float32)
    tgt = rng.standard_normal((N, H, W, J)).astype(np.float32)
    tw = (rng.uniform(size=(N, J)) > 0.3).astype(np.float32)

    ours = float(joints_mse_loss(out, tgt, tw))

    # torch oracle replicating the reference loop
    o = torch.from_numpy(out).permute(0, 3, 1, 2).reshape(N, J, -1)
    t = torch.from_numpy(tgt).permute(0, 3, 1, 2).reshape(N, J, -1)
    w = torch.from_numpy(tw)
    crit = torch.nn.MSELoss(reduction="mean")
    loss = 0.0
    for j in range(J):
        loss = loss + 0.5 * crit(o[:, j] * w[:, j:j + 1],
                                 t[:, j] * w[:, j:j + 1])
    oracle = float(loss) / J
    np.testing.assert_allclose(ours, oracle, rtol=1e-5)


def test_integral_l1_weighted(rng):
    """Oracle = integral-human-pose weighted_l1_loss with size_average:
    sum(|pred - gt| * w) / BATCH (torch reference, re-implemented)."""
    import torch
    pred = rng.standard_normal((3, 4, 3)).astype(np.float32)
    tgt = rng.standard_normal((3, 4, 3)).astype(np.float32)
    w = np.zeros((3, 4), np.float32)
    w[:, 0] = 1.0
    ours = float(integral_l1_loss(pred, tgt, w))
    tp, tt = torch.tensor(pred), torch.tensor(tgt)
    tw = torch.tensor(w)[..., None]
    oracle = float(((tp - tt).abs() * tw).sum() / len(tp))
    np.testing.assert_allclose(ours, oracle, rtol=1e-5)


def test_loss_factory():
    cfg = config
    assert make_loss(cfg) is not None
    cfg.LOSS.TYPE = "IntegralL1Loss"
    assert make_loss(cfg) is not None
    cfg.LOSS.TYPE = "nope"
    with pytest.raises(ValueError):
        make_loss(cfg)


def test_heatmap_accuracy_perfect(rng):
    hm = np.zeros((4, 64, 64, 3), np.float32)
    for n in range(4):
        for j in range(3):
            hm[n, 10 + n, 20 + j, j] = 1.0
    acc, avg, cnt, _ = heatmap_accuracy(hm, hm.copy())
    np.testing.assert_allclose(np.asarray(avg), 1.0)


def test_heatmap_accuracy_degrades(rng):
    gt = np.zeros((8, 64, 64, 2), np.float32)
    pred = np.zeros_like(gt)
    for n in range(8):
        for j in range(2):
            gt[n, 30, 30, j] = 1.0
            pred[n, 30, 30 + (10 if n < 4 else 0), j] = 1.0
    # 10px offset on half the samples; normalizer = 6.4 ⇒ dist 1.56 > 0.5
    acc, avg, cnt, _ = heatmap_accuracy(pred, gt)
    np.testing.assert_allclose(float(avg), 0.5, atol=1e-6)


def test_mpjpe_family(rng):
    gt = rng.standard_normal((6, 17, 3)).astype(np.float32)
    pred = gt + 0.1
    np.testing.assert_allclose(float(mpjpe(pred, gt)),
                               np.sqrt(3) * 0.1, rtol=1e-4)
    # nmpjpe invariant to global scale of pred
    np.testing.assert_allclose(float(nmpjpe(pred * 3.0, gt)),
                               float(nmpjpe(pred, gt)), rtol=1e-4)
    # pa_mpjpe invariant to rigid transform + scale of pred
    import cv2
    R, _ = cv2.Rodrigues(np.array([0.2, -0.1, 0.4]))
    pred_rt = 1.5 * pred @ R.T.astype(np.float32) + np.array(
        [10, 20, 30], np.float32)
    np.testing.assert_allclose(float(pa_mpjpe(pred_rt, gt)),
                               float(pa_mpjpe(pred, gt)), atol=1e-3)


def test_pckh(rng):
    gt = rng.uniform(0, 100, (10, 16, 2)).astype(np.float32)
    pred = gt.copy()
    head = np.full((10,), 10.0, np.float32)
    per_joint, mean = pckh(pred, gt, head)
    np.testing.assert_allclose(float(mean), 100.0)
    pred2 = gt + np.array([20.0, 0.0], np.float32)  # 2 headsizes away
    _, mean2 = pckh(pred2, gt, head)
    np.testing.assert_allclose(float(mean2), 0.0)


def test_pss_same_poses_scores_one(rng):
    import jax
    gt = rng.standard_normal((100, 17, 3)).astype(np.float32)
    centers = fit_pss_centers(jax.random.PRNGKey(0), gt, k=10)
    assert float(pss(gt, gt, centers)) == 1.0
    # heavily corrupted predictions score below 1
    pred = rng.standard_normal((100, 17, 3)).astype(np.float32)
    assert float(pss(pred, gt, centers)) < 0.9


def test_pck3d_auc3d(rng):
    from epipolarpose_tpu.ops.metrics import auc3d, pck3d
    gt = rng.standard_normal((20, 17, 3)).astype(np.float32) * 100
    np.testing.assert_allclose(float(pck3d(gt, gt)), 100.0)
    pred = gt + 100.0  # all joints off by 173mm > 150mm
    assert float(pck3d(pred, gt)) == 0.0
    pred2 = gt + 50.0  # ~86.6mm error: inside 150 but partial AUC
    assert float(pck3d(pred2, gt)) == 100.0
    a = float(auc3d(pred2, gt))
    assert 0.0 < a < 100.0
