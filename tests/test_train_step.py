"""End-to-end slice: jitted train/eval steps on synthetic data.

SURVEY.md §7 minimum slice: one jit train step decreasing loss + validate()
producing PCK on the fake 8-device CPU mesh.
"""

import jax
import numpy as np
import pytest

from epipolarpose_tpu.config import config
from epipolarpose_tpu.core import (
    create_train_state, make_eval_step, make_train_step, train, validate,
)
from epipolarpose_tpu.data import SyntheticPoseDataset, epoch_loader
from epipolarpose_tpu.models import get_model
from epipolarpose_tpu.parallel import make_mesh, shard_batch


def _small_cfg(target="gaussian"):
    cfg = config
    cfg.MODEL.EXTRA.NUM_LAYERS = 18
    cfg.MODEL.NUM_JOINTS = 4
    cfg.MODEL.IMAGE_SIZE = [64, 64]
    cfg.MODEL.EXTRA.HEATMAP_SIZE = [16, 16]
    cfg.MODEL.EXTRA.NUM_DECONV_FILTERS = [32, 32, 32]
    cfg.TRAIN.LR = 0.001
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.PRINT_FREQ = 10
    if target == "integral":
        cfg.MODEL.NAME = "pose3d_resnet"
        cfg.MODEL.EXTRA.TARGET_TYPE = "integral"
        cfg.MODEL.EXTRA.DEPTH_DIM = 4
        cfg.LOSS.TYPE = "IntegralL1Loss"
    return cfg


def _synthetic_batch(cfg, n=8, seed=0):
    rng = np.random.default_rng(seed)
    J = cfg.MODEL.NUM_JOINTS
    H = W = cfg.MODEL.IMAGE_SIZE[0]
    batch = {
        "input": rng.uniform(0, 1, (n, H, W, 3)).astype(np.float32),
        "joints": rng.uniform(5, W - 5, (n, J, 2)).astype(np.float32),
        "joints_vis": np.ones((n, J), np.float32),
        "center": np.full((n, 2), W / 2, np.float32),
        "scale": np.full((n, 2), W / 200, np.float32),
    }
    batch["joints_3d"] = np.concatenate(
        [batch["joints"], rng.uniform(-400, 400, (n, J, 1))],
        axis=-1).astype(np.float32)
    return batch


def test_gaussian_loss_decreases():
    cfg = _small_cfg("gaussian")
    model = get_model(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0),
                               steps_per_epoch=10)
    step = make_train_step(cfg, model, donate=False)
    batch = _synthetic_batch(cfg)
    losses = []
    for _ in range(12):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.8, losses
    assert np.isfinite(losses).all()
    assert "acc" in metrics


def test_integral_loss_decreases():
    cfg = _small_cfg("integral")
    model = get_model(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0),
                               steps_per_epoch=10)
    step = make_train_step(cfg, model, donate=False)
    batch = _synthetic_batch(cfg)
    losses = []
    for _ in range(25):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    # integral L1 descends slowly on random data; require a steady decrease
    assert losses[-1] < losses[0] * 0.9, losses
    assert all(b <= a + 1e-4 for a, b in zip(losses[:5], losses[1:6]))


def test_sharded_train_step_8_devices():
    """DP over the virtual 8-device CPU mesh (SURVEY §4 multi-device)."""
    cfg = _small_cfg("gaussian")
    mesh = make_mesh(cfg)
    assert mesh.shape["data"] == 8
    model = get_model(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0),
                               steps_per_epoch=10)
    step = make_train_step(cfg, model, mesh=mesh, donate=False)
    batch = shard_batch(_synthetic_batch(cfg, n=16), mesh)
    state2, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    # params stay replicated; batch is sharded over data
    assert batch["input"].sharding.spec[0] == "data"
    leaf = jax.tree.leaves(state2.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_sharded_matches_single_device():
    """The DP step must compute the same numbers as single-device."""
    cfg = _small_cfg("gaussian")
    model = get_model(cfg)
    state_a = create_train_state(cfg, model, jax.random.PRNGKey(0),
                                 steps_per_epoch=10)
    state_b = jax.tree.map(lambda x: x, state_a)
    batch = _synthetic_batch(cfg, n=16)

    single = make_train_step(cfg, model, donate=False)
    state_a, ma = single(state_a, batch)

    mesh = make_mesh(cfg)
    sharded = make_train_step(cfg, model, mesh=mesh, donate=False)
    state_b, mb = sharded(state_b, shard_batch(batch, mesh))

    np.testing.assert_allclose(float(ma["loss"]), float(mb["loss"]),
                               rtol=1e-5)
    # adam normalizes near-zero grads, so reduction-order noise can flip an
    # update's sign; one step keeps params within ~2*lr of each other
    la = jax.tree.leaves(state_a.params)[0]
    lb = jax.tree.leaves(state_b.params)[0]
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=2.5e-3)


def test_eval_step_flip_test():
    cfg = _small_cfg("gaussian")
    cfg.TEST.FLIP_TEST = True
    model = get_model(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0),
                               steps_per_epoch=10)
    estep = make_eval_step(cfg, model, flip_pairs=((0, 1), (2, 3)))
    out = estep(state, _synthetic_batch(cfg))
    assert out["preds"].shape == (8, 4, 2)
    assert np.isfinite(np.asarray(out["preds"])).all()


def test_eval_step_integral_3d():
    cfg = _small_cfg("integral")
    model = get_model(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0),
                               steps_per_epoch=10)
    estep = make_eval_step(cfg, model)
    out = estep(state, _synthetic_batch(cfg))
    assert out["preds"].shape == (8, 4, 3)


def test_full_epoch_train_and_validate():
    """Dataset -> loader -> train() -> validate() with real loop plumbing."""
    cfg = _small_cfg("gaussian")
    cfg.DATASET.DATASET = "synthetic"
    model = get_model(cfg)
    ds = SyntheticPoseDataset(cfg, num_samples=16, is_train=True,
                              image_shape=(64, 64))
    state = create_train_state(cfg, model, jax.random.PRNGKey(0),
                               steps_per_epoch=2)
    tstep = make_train_step(cfg, model, donate=False)
    estep = make_eval_step(cfg, model)
    loader = epoch_loader(ds, 8, epoch=0)
    state, avg_loss = train(cfg, loader, state, tstep, epoch=0)
    assert np.isfinite(avg_loss)
    dv = SyntheticPoseDataset(cfg, num_samples=8, is_train=False,
                              image_shape=(64, 64))
    vloader = epoch_loader(dv, 8, epoch=0, is_train=False)
    name_values, perf = validate(cfg, vloader, dv, state, estep)
    assert 0.0 <= perf <= 100.0


def test_lr_schedule():
    from epipolarpose_tpu.core import make_lr_schedule
    cfg = _small_cfg()
    cfg.TRAIN.LR = 0.1
    cfg.TRAIN.LR_STEP = [2, 4]
    cfg.TRAIN.LR_FACTOR = 0.1
    sched = make_lr_schedule(cfg, steps_per_epoch=10)
    np.testing.assert_allclose(float(sched(0)), 0.1)
    np.testing.assert_allclose(float(sched(25)), 0.01, rtol=1e-6)
    np.testing.assert_allclose(float(sched(45)), 0.001, rtol=1e-6)


def test_spatial_sharding_matches_single_device():
    """DP x SP mesh (4x2): image rows sharded over 'model'; GSPMD inserts
    the conv halo exchanges and the loss must match unsharded exactly."""
    import jax
    from jax.sharding import Mesh
    cfg = _small_cfg("gaussian")
    cfg.TPU.MESH.DATA = 4
    cfg.TPU.MESH.MODEL = 2
    mesh = make_mesh(cfg)
    assert mesh.shape == {"data": 4, "model": 2}
    model = get_model(cfg)
    state_a = create_train_state(cfg, model, jax.random.PRNGKey(0), 10)
    state_b = jax.tree.map(lambda x: x, state_a)
    batch = _synthetic_batch(cfg, n=8)

    single = make_train_step(cfg, model, donate=False)
    state_a, ma = single(state_a, batch)

    sharded = make_train_step(cfg, model, mesh=mesh, donate=False)
    dev_batch = shard_batch(batch, mesh)
    assert dev_batch["input"].sharding.spec[1] == "model"
    state_b, mb = sharded(state_b, dev_batch)
    np.testing.assert_allclose(float(ma["loss"]), float(mb["loss"]),
                               rtol=1e-5)
