"""Protocol hardening (SURVEY §5 sanitizers row + VERDICT r1 item 9):
jax.debug_nans sweep over the jitted steps, PSS train-split centers,
MPII pred.mat submission format."""

import json
import os

import jax
import numpy as np
import pytest

from epipolarpose_tpu.config import config
from epipolarpose_tpu.core import create_train_state, make_eval_step, \
    make_train_step
from epipolarpose_tpu.data import SyntheticPoseDataset
from epipolarpose_tpu.models import get_model


def _tiny_cfg(target="gaussian"):
    cfg = config
    cfg.MODEL.NAME = "pose_resnet" if target == "gaussian" \
        else "pose3d_resnet"
    cfg.MODEL.NUM_JOINTS = 16
    cfg.MODEL.IMAGE_SIZE = [64, 64]
    cfg.MODEL.EXTRA.HEATMAP_SIZE = [16, 16]
    cfg.MODEL.EXTRA.NUM_LAYERS = 18
    cfg.MODEL.EXTRA.NUM_DECONV_FILTERS = [32, 32, 32]
    cfg.MODEL.EXTRA.TARGET_TYPE = target
    cfg.MODEL.EXTRA.DEPTH_DIM = 1 if target == "gaussian" else 4
    cfg.TPU.COMPUTE_DTYPE = "float32"
    return cfg


def test_train_and_eval_steps_under_debug_nans():
    """The sanitizer CI pass: no NaN may APPEAR anywhere inside the fused
    train/eval computations on sane inputs (jax.debug_nans raises at the
    first producing op, not just on the outputs)."""
    with jax.debug_nans(True):
        for target in ("gaussian", "integral"):
            cfg = _tiny_cfg(target)
            model = get_model(cfg)
            state = create_train_state(cfg, model, jax.random.PRNGKey(0), 5)
            tstep = make_train_step(cfg, model, donate=False)
            estep = make_eval_step(cfg, model, flip_pairs=((0, 5), (1, 4)))
            ds = SyntheticPoseDataset(cfg, num_samples=8,
                                      image_shape=(64, 64))
            batch = ds.get_batch(list(range(8)))
            if target == "integral":
                batch["joints_3d"] = np.concatenate(
                    [batch["joints"],
                     np.zeros_like(batch["joints"][..., :1])], axis=-1)
            state, m = tstep(state, batch)
            assert np.isfinite(float(m["loss"]))
            out = estep(state, batch)
            assert np.isfinite(np.asarray(out["preds"])).all()


def test_pss_centers_prefer_train_split(tmp_path):
    """PSS clusters must come from TRAIN poses (cached), not the eval GT."""
    from epipolarpose_tpu.data.h36m import H36MDataset
    from epipolarpose_tpu.data.synthetic import write_synthetic_h36m
    cfg = config
    cfg.MODEL.NUM_JOINTS = 17
    # 26 frames x 4 views = 104 records >= 2k for k=50
    write_synthetic_h36m(str(tmp_path), cfg, num_frames=26)
    import epipolarpose_tpu.data.h36m as h36m_mod
    orig = h36m_mod.CAMERA_IDS
    h36m_mod.CAMERA_IDS = ("0", "1", "2", "3")
    try:
        ds = H36MDataset(cfg, str(tmp_path), "valid", is_train=False)
        centers = ds.pss_centers(50)
        assert centers is not None and centers.shape[0] == 50
        from epipolarpose_tpu.ops.metrics import PSS_EMBED_VERSION
        cache = tmp_path / "annot" / f"pss_centers_k50_v{PSS_EMBED_VERSION}.npy"
        assert cache.exists()                      # cached for reuse
        again = ds.pss_centers(50)
        np.testing.assert_array_equal(centers, again)
    finally:
        h36m_mod.CAMERA_IDS = orig


def test_pred_mat_submission_format(tmp_path):
    """validate() must persist pred.mat with the official eval kit's field
    name ('preds', (N, J, >=2) with x/y in source pixels — the reference's
    savemat(..., mdict={'preds': preds}) format)."""
    pytest.importorskip("scipy")
    from scipy.io import loadmat
    from epipolarpose_tpu.core import validate
    from epipolarpose_tpu.data import epoch_loader

    cfg = _tiny_cfg("gaussian")
    model = get_model(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), 5)
    estep = make_eval_step(cfg, model)
    ds = SyntheticPoseDataset(cfg, num_samples=8, is_train=False,
                              image_shape=(64, 64))
    loader = epoch_loader(ds, 8, 0, is_train=False)
    validate(cfg, loader, ds, state, estep, output_dir=str(tmp_path))
    mat = loadmat(str(tmp_path / "pred.mat"))
    assert "preds" in mat
    assert mat["preds"].shape[0] == len(ds)
    assert mat["preds"].shape[1] == cfg.MODEL.NUM_JOINTS
    assert mat["preds"].shape[2] >= 2
