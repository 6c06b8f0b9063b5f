"""K-step fused driver: one dispatch = K optimizer steps via lax.scan.

VERDICT r2 next-round #1: per-step host dispatch through a high-RTT
host<->device link dominates input-fed training; TPU.FUSED_STEPS=K
amortizes it. These tests pin the driver's contract: a K-step fused call
is loss- and parameter-equivalent to K single steps on the same batches.
"""

import jax
import jax.numpy as jnp
import numpy as np

from epipolarpose_tpu.config import config
from epipolarpose_tpu.core import (
    create_train_state, make_train_step, train,
)
from epipolarpose_tpu.data import SyntheticPoseDataset, epoch_loader
from epipolarpose_tpu.data.pipeline import stack_batches
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


def _batches(cfg, k, n=8, seed=0):
    rng = np.random.default_rng(seed)
    J = cfg.MODEL.NUM_JOINTS
    H = W = cfg.MODEL.IMAGE_SIZE[0]
    out = []
    for _ in range(k):
        out.append({
            "input": rng.uniform(0, 1, (n, H, W, 3)).astype(np.float32),
            "joints": rng.uniform(5, W - 5, (n, J, 2)).astype(np.float32),
            "joints_vis": np.ones((n, J), np.float32),
            "center": np.full((n, 2), W / 2, np.float32),
            "scale": np.full((n, 2), W / 200, np.float32),
        })
    return out


def test_fused_matches_k_single_steps():
    """The scan driver must be step-for-step equivalent to K dispatches:
    identical per-step losses and identical final parameters."""
    cfg = _small_cfg("gaussian")
    model = get_model(cfg)
    K = 3
    batches = _batches(cfg, K)
    state_a = create_train_state(cfg, model, jax.random.PRNGKey(0), 10)
    state_b = jax.tree.map(lambda x: x, state_a)

    single = make_train_step(cfg, model, donate=False)
    losses_single = []
    for b in batches:
        state_a, m = single(state_a, b)
        losses_single.append(float(m["loss"]))

    fused = make_train_step(cfg, model, donate=False, fused_steps=K)
    superbatch = next(stack_batches(iter(batches), K))
    assert superbatch["input"].shape[0] == K
    state_b, m = fused(state_b, superbatch)

    np.testing.assert_allclose(np.asarray(m["loss"]), losses_single,
                               rtol=1e-5)
    assert int(state_b.step) == int(state_a.step) == K
    # the scan compiles a different (fused) program, so float reduction
    # order differs; adam normalizes near-zero grads, so a sign flip costs
    # up to ~lr per step -> ~K*lr worst case (cf. the same-tolerance note
    # in test_sharded_matches_single_device). The per-step LOSS match
    # above is the trajectory-equivalence proof; this is a sanity bound.
    for la, lb in zip(jax.tree.leaves(state_a.params),
                      jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   atol=3e-3)
    # BN running stats track activations of the (slightly diverged, see
    # above) params — bound them by the same noise scale
    for la, lb in zip(jax.tree.leaves(state_a.batch_stats),
                      jax.tree.leaves(state_b.batch_stats)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   atol=1e-3)


def test_fused_sharded_matches_unsharded():
    """Fused driver under the 8-device DP mesh: super-batch sharded with
    batch_axis=1 (scan axis replicated, batch axis over 'data')."""
    cfg = _small_cfg("gaussian")
    model = get_model(cfg)
    K = 2
    batches = _batches(cfg, K, n=16)
    state_a = create_train_state(cfg, model, jax.random.PRNGKey(0), 10)
    state_b = jax.tree.map(lambda x: x, state_a)

    fused = make_train_step(cfg, model, donate=False, fused_steps=K)
    superbatch = next(stack_batches(iter(batches), K))
    state_a, ma = fused(state_a, superbatch)

    mesh = make_mesh(cfg)
    fused_sh = make_train_step(cfg, model, mesh=mesh, donate=False,
                               fused_steps=K)
    dev = shard_batch(superbatch, mesh, batch_axis=1)
    assert dev["input"].sharding.spec[1] == "data"
    assert dev["input"].sharding.spec[0] is None
    state_b, mb = fused_sh(state_b, dev)
    np.testing.assert_allclose(np.asarray(ma["loss"]),
                               np.asarray(mb["loss"]), rtol=1e-5)


def test_stack_batches_remainder_and_pytrees():
    batches = [{"a": np.full((4, 2), i, np.float32),
                "nested": {"b": np.full((4,), i, np.float32)}}
               for i in range(5)]
    stacked = list(stack_batches(iter(batches), 2))
    assert [s["a"].shape[0] for s in stacked] == [2, 2, 1]
    np.testing.assert_array_equal(stacked[1]["nested"]["b"][:, 0], [2, 3])
    # drop_remainder drops the odd tail
    assert len(list(stack_batches(iter(batches), 2,
                                  drop_remainder=True))) == 2


def test_train_loop_with_fused_loader():
    """epoch_loader(fused_steps=K) -> train(): step count and metric
    bookkeeping survive the extra leading axis (incl. the odd tail)."""
    cfg = _small_cfg("gaussian")
    cfg.DATASET.DATASET = "synthetic"
    model = get_model(cfg)
    ds = SyntheticPoseDataset(cfg, num_samples=24, is_train=True,
                              image_shape=(64, 64))
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), 3)
    tstep = make_train_step(cfg, model, donate=False, fused_steps=2)
    # 24 samples / bs8 = 3 batches -> one (2,...) super-batch + one (1,...)
    loader = epoch_loader(ds, 8, epoch=0, fused_steps=2)
    state, avg_loss = train(cfg, loader, state, tstep, epoch=0)
    assert int(state.step) == 3
    assert np.isfinite(avg_loss)


def test_fused_ss_step_matches_sequential():
    """The self-supervised step fuses the same way (teacher -> DLT ->
    student, K groups of multi-view batches per dispatch)."""
    from epipolarpose_tpu.core.self_supervised import (
        load_teacher, make_gt_teacher, make_ss_train_step)
    from epipolarpose_tpu.data import SyntheticMultiviewDataset

    cfg = _small_cfg("integral")
    cfg.MODEL.NUM_JOINTS = 17
    cfg.DATASET.LABEL_SOURCE = "triangulated"
    cfg.TPU.SS_CONF_MIN = -1.0
    model = get_model(cfg)
    teacher = load_teacher(cfg)
    ds = SyntheticMultiviewDataset(cfg, num_frames=4, is_train=False,
                                   image_shape=(64, 64))
    K, G = 2, 2
    batches = []
    gts = []
    for bi, b in enumerate(ds.view_batches(G, shuffle=False)):
        if bi >= K:
            break
        b.pop("joints_3d", None)
        batches.append(b)
        gts.append(np.stack([ds.records[i].joints
                             for g in ds.view_groups[bi * G:(bi + 1) * G]
                             for i in g]))
    # GT detections ride IN the batch ('gt_src' leaf) so the fused scan
    # sees per-step detections; the step pops them into a GT detector
    for b, g in zip(batches, gts):
        b["gt_src"] = g.astype(np.float32)

    def raw_step(state, batch):
        batch = dict(batch)
        det = make_gt_teacher(batch.pop("gt_src"))
        step = make_ss_train_step(cfg, model, teacher, donate=False,
                                  detect_fn=det)
        return step(state, batch)

    # sequential reference: one dispatch per batch
    state_a = create_train_state(cfg, model, jax.random.PRNGKey(0), 10)
    state_b = jax.tree.map(lambda x: x, state_a)
    seq_losses = []
    for b in batches:
        state_a, m = raw_step(state_a, dict(b))
        seq_losses.append(float(m["loss"]))

    from epipolarpose_tpu.core.steps import compile_step
    fused = compile_step(raw_step, fused_steps=K)
    superbatch = next(stack_batches(iter(batches), K))
    state_b, m = fused(state_b, superbatch)
    np.testing.assert_allclose(np.asarray(m["loss"]), seq_losses,
                               rtol=1e-4)
    # adam noise amplification as in test_fused_matches_k_single_steps
    for la, lb in zip(jax.tree.leaves(state_a.params),
                      jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   atol=2.5e-3)


def test_train_loop_tail_superbatch_sample_weighting():
    """A tail super-batch holding ONE stacked batch (loss shape (1,)) must
    weight the loss average by the true batch size, not the scan axis.
    Regression for the round-3 review: fused detection by rank, not size."""
    import types

    cfg = _small_cfg("gaussian")
    cfg.PRINT_FREQ = 1

    class FakeState:
        step = 0

    # super-batch (K=2, bs=8) with loss 1.0/step, then a (1, bs=8) tail
    # with loss 4.0: correct weighted avg = (16*1 + 8*4)/24 = 2.0; the
    # size-based bug weighted the tail by n=1 -> (16+4)/17 = 1.18
    batches = [
        {"input": np.zeros((2, 8, 4, 4, 3), np.float32)},
        {"input": np.zeros((1, 8, 4, 4, 3), np.float32)},
    ]
    losses = iter([np.array([1.0, 1.0]), np.array([4.0])])

    def fake_step(state, batch):
        return state, {"loss": next(losses)}

    state, avg = train(cfg, iter(batches), FakeState(), fake_step, epoch=0)
    np.testing.assert_allclose(avg, 2.0)


def test_fused_eval_matches_single_and_validate_flattens():
    """Fused eval (stateless scan over a K-super-batch) must return
    batch-for-batch identical predictions, and validate() must flatten
    the (K, bs, ...) outputs to the same perf as the unfused loop —
    including a ragged tail super-batch."""
    from epipolarpose_tpu.core import make_eval_step, validate

    cfg = _small_cfg("gaussian")
    cfg.DATASET.DATASET = "synthetic"
    model = get_model(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), 10)
    K = 2
    batches = _batches(cfg, K)
    single = make_eval_step(cfg, model)
    fused = make_eval_step(cfg, model, fused_steps=K)
    outs = [single(state, b) for b in batches]
    fo = fused(state, next(stack_batches(iter(batches), K)))
    assert fo["preds"].shape[0] == K
    for i in range(K):
        np.testing.assert_allclose(np.asarray(fo["preds"][i]),
                                   np.asarray(outs[i]["preds"]),
                                   rtol=1e-5, atol=1e-5)

    from epipolarpose_tpu.data import SyntheticPoseDataset
    dv = SyntheticPoseDataset(cfg, num_samples=16, is_train=False,
                              image_shape=(64, 64))
    _, perf1 = validate(cfg, epoch_loader(dv, 4, 0, is_train=False),
                        dv, state, make_eval_step(cfg, model))
    # fused_steps=3 over 4 batches -> supers of 3 and 1 (ragged tail)
    _, perf3 = validate(
        cfg, epoch_loader(dv, 4, 0, is_train=False, fused_steps=3),
        dv, state, make_eval_step(cfg, model, fused_steps=3))
    np.testing.assert_allclose(perf3, perf1, rtol=1e-6)


def test_fused_eval_sharded_matches_unsharded():
    """Fused eval under the 8-device DP mesh (the pod-relevant shape):
    super-batch sharded at batch_axis=1, outputs replicated — predictions
    must match the single-device fused eval."""
    from epipolarpose_tpu.core import make_eval_step

    cfg = _small_cfg("gaussian")
    model = get_model(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), 10)
    K = 2
    superbatch = next(stack_batches(iter(_batches(cfg, K, n=16)), K))

    out_a = make_eval_step(cfg, model, fused_steps=K)(state, superbatch)

    mesh = make_mesh(cfg)
    dev = shard_batch(superbatch, mesh, batch_axis=1)
    assert dev["input"].sharding.spec[1] == "data"
    out_b = make_eval_step(cfg, model, mesh=mesh, fused_steps=K)(state, dev)
    np.testing.assert_allclose(np.asarray(out_a["preds"]),
                               np.asarray(out_b["preds"]),
                               rtol=1e-5, atol=1e-5)
