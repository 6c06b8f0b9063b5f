"""Orbax checkpoint save/restore round-trip (SURVEY §4 integration test)."""

import jax
import numpy as np

from epipolarpose_tpu.config import config
from epipolarpose_tpu.core import CheckpointManager, create_train_state
from epipolarpose_tpu.models import get_model


def _tiny_state():
    cfg = config
    cfg.MODEL.EXTRA.NUM_LAYERS = 18
    cfg.MODEL.NUM_JOINTS = 2
    cfg.MODEL.IMAGE_SIZE = [32, 32]
    cfg.MODEL.EXTRA.NUM_DECONV_FILTERS = [8, 8, 8]
    cfg.TPU.COMPUTE_DTYPE = "float32"
    model = get_model(cfg)
    return create_train_state(cfg, model, jax.random.PRNGKey(0),
                              steps_per_epoch=5)


def test_save_restore_roundtrip(tmp_path):
    state = _tiny_state()
    mngr = CheckpointManager(str(tmp_path / "ckpt"))
    mngr.save(1, state, epoch=0, perf=10.0, wait=True)

    # perturb, then restore into the perturbed template
    perturbed = state.replace(
        params=jax.tree.map(lambda x: x + 1.0, state.params))
    restored, next_epoch = mngr.restore(perturbed)
    assert next_epoch == 1
    a = jax.tree.leaves(state.params)[0]
    b = jax.tree.leaves(restored.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    mngr.close()


def test_best_tracking_and_final(tmp_path):
    state = _tiny_state()
    mngr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    mngr.save(1, state, epoch=0, perf=10.0)
    mngr.save(2, state.replace(step=state.step + 1), epoch=1, perf=30.0)
    mngr.save(3, state.replace(step=state.step + 2), epoch=2, perf=20.0)
    mngr.wait()
    assert mngr.best_step == 2
    path = mngr.save_final(state)
    import os
    assert os.path.exists(path)
    mngr.close()


def test_restore_empty_dir(tmp_path):
    state = _tiny_state()
    mngr = CheckpointManager(str(tmp_path / "empty"))
    restored, epoch = mngr.restore(state)
    assert epoch == 0
    mngr.close()


def test_latest_survives_metric_plateau(tmp_path):
    """Resume safety: with best tracked in a separate manager, the LATEST
    step must never be garbage-collected just because the metric stopped
    improving (quality-based retention would roll RESUME back to an old
    best step)."""
    state = _tiny_state()
    mngr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2,
                             best_mode="min")
    mngr.save(1, state, epoch=0, perf=40.0)               # best
    for i, perf in enumerate((50.0, 55.0, 60.0), start=2):  # worsening
        mngr.save(i, state.replace(step=state.step + i), epoch=i - 1,
                  perf=perf)
    mngr.wait()
    assert mngr.best_step == 1
    _, next_epoch = mngr.restore(state)
    assert next_epoch == 4            # resumed from step 4 (epoch 3) + 1
    mngr.close()


def test_best_tracking_min_mode(tmp_path):
    """MPJPE-style metrics (lower=better) must keep the LOWEST-perf step."""
    state = _tiny_state()
    mngr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2,
                             best_mode="min")
    mngr.save(1, state, epoch=0, perf=60.0)
    mngr.save(2, state.replace(step=state.step + 1), epoch=1, perf=45.0)
    mngr.save(3, state.replace(step=state.step + 2), epoch=2, perf=52.0)
    mngr.wait()
    assert mngr.best_step == 2
    mngr.close()


def test_best_perf_recovered_from_payload_on_resume(tmp_path):
    """ADVICE r2: when best/ metadata is unreadable or lacks 'perf', the
    manager must fall back to the 'perf' leaf saved inside the best
    payload — NOT reset to None (which would let the next save overwrite
    best/ with a worse checkpoint)."""
    state = _tiny_state()
    mngr = CheckpointManager(str(tmp_path / "ckpt"), best_mode="min")
    mngr.save(1, state, epoch=0, perf=42.0, wait=True)
    mngr.wait()
    mngr.close()

    reopened = CheckpointManager(str(tmp_path / "ckpt"), best_mode="min")
    assert reopened._best_perf == 42.0            # metadata path
    # simulate broken/legacy metadata: the payload fallback must win
    reopened._best.metadata = lambda s: (_ for _ in ()).throw(IOError())
    assert reopened._read_best_perf(1) == 42.0
    # and a worse perf must NOT displace the recovered best
    reopened._best_perf = reopened._read_best_perf(1)
    assert not reopened._improved(60.0)
    assert reopened._improved(40.0)
    reopened.close()


def test_resolve_and_load_variables_all_layouts(tmp_path):
    """load_variables accepts every checkpoint layout the trainer writes:
    manager root, best/ root, step dir, payload dir, final_state, and the
    virtual 'latest' name — mirroring the reference's one-file
    TEST.MODEL_FILE ergonomics."""
    from epipolarpose_tpu.core import load_variables, resolve_checkpoint_path

    state = _tiny_state()
    root = str(tmp_path / "ckpt")
    mngr = CheckpointManager(root, best_mode="min")
    mngr.save(1, state, epoch=0, perf=9.0, wait=True)
    bumped = state.replace(
        params=jax.tree.map(lambda x: x + 1.0, state.params))
    mngr.save(2, bumped, epoch=1, perf=7.0, wait=True)
    final = mngr.save_final(bumped)
    mngr.close()

    template = {"params": state.params, "batch_stats": state.batch_stats}
    ref = np.asarray(jax.tree_util.tree_leaves(bumped.params)[0])
    import os
    for path in (root,                                  # manager root
                 os.path.join(root, "latest"),          # virtual name
                 os.path.join(root, "best"),            # best manager root
                 os.path.join(root, "2"),               # step dir
                 os.path.join(root, "2", "default"),    # payload dir
                 final):                                # final_state
        got = load_variables(path, template)
        assert set(got) == {"params", "batch_stats"}, path
        np.testing.assert_array_equal(
            np.asarray(jax.tree_util.tree_leaves(got["params"])[0]), ref,
            err_msg=path)

    import pytest
    with pytest.raises(FileNotFoundError):
        resolve_checkpoint_path(str(tmp_path / "nonexistent"))
