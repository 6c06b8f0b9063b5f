"""Data layer: synthetic datasets, MPII file round-trip, prefetch, zipreader."""

import os
import zipfile

import numpy as np

from epipolarpose_tpu.config import config
from epipolarpose_tpu.data import (
    MPIIDataset, SyntheticMultiviewDataset, SyntheticPoseDataset,
    device_prefetch, get_dataset, write_synthetic_mpii,
)
from epipolarpose_tpu.data.zipreader import imread, is_zip_path


def test_synthetic_batch_shapes():
    cfg = config
    ds = SyntheticPoseDataset(cfg, num_samples=8)
    b = ds.get_batch([0, 1, 2, 3])
    assert b["input"].shape == (4, 256, 256, 3)
    assert b["joints"].shape == (4, 16, 2)
    assert b["joints_vis"].shape == (4, 16)
    # crops ship as uint8 (4x fewer host->device bytes); normalization
    # happens inside the jitted step
    assert b["input"].dtype == np.uint8


def test_synthetic_joints_land_on_blobs():
    cfg = config
    ds = SyntheticPoseDataset(cfg, num_samples=4, is_train=False)
    b = ds.get_batch([0])
    img, joints = b["input"][0], b["joints"][0]
    # crop-space joints inside the crop must sit on bright pixels
    vals = []
    for x, y in joints:
        if 2 <= x < 254 and 2 <= y < 254:
            vals.append(img[int(round(y)), int(round(x))].sum())
    assert np.median(vals) > 3 * np.median(img.sum(-1))


def test_train_augmentation_varies():
    cfg = config
    ds = SyntheticPoseDataset(cfg, num_samples=4, is_train=True)
    b1 = ds.get_batch([0], seed=1)
    b2 = ds.get_batch([0], seed=2)
    assert not np.allclose(b1["input"], b2["input"])
    # eval mode is deterministic
    dv = SyntheticPoseDataset(cfg, num_samples=4, is_train=False)
    e1 = dv.get_batch([0], seed=1)
    e2 = dv.get_batch([0], seed=2)
    np.testing.assert_allclose(e1["input"], e2["input"])


def test_epoch_batches_and_prefetch():
    cfg = config
    ds = SyntheticPoseDataset(cfg, num_samples=10)
    batches = list(device_prefetch(ds.batches(4, seed=0), size=2))
    assert len(batches) == 2                       # drop_last
    assert batches[0]["input"].shape[0] == 4
    import jax
    assert isinstance(batches[0]["input"], jax.Array)


def test_multiview_dataset_groups():
    cfg = config
    cfg.MODEL.NUM_JOINTS = 17
    ds = SyntheticMultiviewDataset(cfg, num_frames=3)
    assert len(ds.view_groups) == 3
    assert len(ds.records) == 12
    b = next(ds.view_batches(2, shuffle=False))
    assert b["input"].shape == (2, 4, 256, 256, 3)
    assert b["joints_3d"].shape == (2, 4, 17, 3)
    assert b["camera"].R.shape == (2, 4, 3, 3)


def test_multiview_projection_consistency():
    """The rendered 2D joints must equal the projection of the 3D pose."""
    from epipolarpose_tpu.geometry import project_point_radial
    cfg = config
    cfg.MODEL.NUM_JOINTS = 17
    ds = SyntheticMultiviewDataset(cfg, num_frames=2)
    rec = ds.records[0]
    cam = ds.camera_for(rec)
    pose_w = rec.meta["pose_world"]
    px, _ = project_point_radial(pose_w[None], cam)
    np.testing.assert_allclose(np.asarray(px)[0], rec.joints, atol=1e-2)


def test_multiview_skeleton_mode_structured():
    """pose_mode='skeleton' must produce kinematic-tree poses (constant
    bone lengths across frames) that still project in-bounds on the rig —
    the property the chip SS-convergence experiment relies on for
    learnable monocular depth (docs/SS_TEACHER.md)."""
    from epipolarpose_tpu.data.synthetic import skeleton_template
    cfg = config
    cfg.MODEL.NUM_JOINTS = 17
    ds = SyntheticMultiviewDataset(cfg, num_frames=6, pose_mode="skeleton")
    poses = np.stack([ds.records[ds.view_groups[t][0]].meta["pose_world"]
                      for t in range(6)])
    parents, lengths, _, _ = skeleton_template(cfg.MODEL.NUM_JOINTS)
    bones = np.linalg.norm(poses[:, 1:] - poses[:, parents[1:]], axis=-1)
    assert bones.std(axis=0).max() < 1e-2          # constant across frames
    np.testing.assert_allclose(bones.mean(0), lengths[1:], atol=1e-2)
    px = np.stack([r.joints for r in ds.records])
    size = ds.image_shape[0] * 4
    assert px.min() >= 0 and px.max() <= size
    # frames differ (a real pose manifold, not one repeated pose)
    assert np.linalg.norm(poses[0] - poses[1]) > 100.0


def test_multiview_depth_cue_rendering():
    """depth_cue>0 renders nearer joints with larger blobs (perspective
    size cue, sigma ∝ (z_mean/z)^gamma) and depth_cue=0 keeps the
    constant-sigma render — the observability knob behind the SS
    dose-response experiment (docs/SS_TEACHER.md)."""
    from epipolarpose_tpu.data.synthetic import _render_blobs
    cfg = config
    cfg.MODEL.NUM_JOINTS = 17
    kw = dict(num_frames=2, pose_mode="skeleton", image_shape=(64, 64))
    ds0 = SyntheticMultiviewDataset(cfg, depth_cue=0.0, **kw)
    ds1 = SyntheticMultiviewDataset(cfg, depth_cue=1.0, **kw)
    rec = ds1.records[0]
    size = ds1.image_shape[0] * 4
    base = float(rec.scale[0] * 200 / 40)
    z = rec.joints_3d[:, 2]
    assert z.min() > 0 and z.max() / z.min() > 1.01   # real depth spread
    expect = _render_blobs(rec.joints, (size, size), 17,
                           blob_sigma=base * (z.mean() / z))
    got = ds1._read_image(rec.image)
    np.testing.assert_array_equal(got, (expect * 255).astype(np.uint8))
    # cue off reproduces the constant-sigma render; cue on differs
    flat = _render_blobs(rec.joints, (size, size), 17, blob_sigma=base)
    np.testing.assert_array_equal(ds0._read_image(rec.image),
                                  (flat * 255).astype(np.uint8))
    assert (got != (flat * 255).astype(np.uint8)).any()
    # labels are unchanged: the cue alters appearance only
    np.testing.assert_array_equal(rec.joints, ds0.records[0].joints)


def test_mpii_file_roundtrip(tmp_path):
    cfg = config
    write_synthetic_mpii(str(tmp_path), cfg, num_samples=4)
    ds = MPIIDataset(cfg, str(tmp_path), "valid", is_train=False)
    assert len(ds) == 4
    b = ds.get_batch([0, 1])
    assert b["input"].shape == (2, 256, 256, 3)
    # evaluate with perfect predictions -> 100 PCKh
    preds = np.stack([r.joints for r in ds.records])
    name_value, mean = ds.evaluate(cfg, preds)
    assert mean == 100.0
    assert name_value["Mean"] == 100.0


def test_registry():
    cfg = config
    cfg.DATASET.DATASET = "synthetic"
    ds = get_dataset(cfg, "train", True, num_samples=4)
    assert isinstance(ds, SyntheticPoseDataset)


def test_zipreader(tmp_path):
    import cv2
    img = (np.random.default_rng(0).uniform(0, 255, (32, 32, 3))
           .astype(np.uint8))
    img_path = tmp_path / "img.png"
    cv2.imwrite(str(img_path), img)
    zpath = tmp_path / "a.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        z.write(img_path, "sub/img.png")
    assert is_zip_path(f"{zpath}@/sub/img.png")
    out = imread(f"{zpath}@/sub/img.png")
    np.testing.assert_array_equal(out, img)


def test_prefetch_propagates_errors():
    def gen():
        yield {"x": np.zeros(3)}
        raise RuntimeError("boom")

    it = device_prefetch(gen(), size=1)
    next(it)
    import pytest
    with pytest.raises(RuntimeError, match="boom"):
        next(it)


def test_prefetch_releases_producer_on_abandon():
    """Closing the prefetch generator early must unblock the producer
    thread (bounded puts + stop flag) instead of leaving it pinned on a
    full queue holding device batches."""
    import threading
    import time
    started = threading.Event()
    produced = []

    def gen():
        for i in range(100):
            started.set()
            produced.append(i)
            yield {"x": np.full(3, i)}

    it = device_prefetch(gen(), size=1)
    next(it)
    started.wait(5)
    it.close()                       # abandon mid-epoch
    n_threads = threading.active_count()
    deadline = time.time() + 10
    while time.time() < deadline:
        if len(produced) == (n := len(produced)):
            time.sleep(0.8)
            if len(produced) == n:   # producer stopped making progress
                break
    stalled_at = len(produced)
    time.sleep(1.2)
    assert len(produced) == stalled_at < 100, \
        "producer kept running after the consumer abandoned the iterator"
    assert threading.active_count() <= n_threads


def test_h36m_file_roundtrip(tmp_path):
    """Full H36M-format on-disk round trip: zip images via zipreader,
    cameras.json, view groups, multi-view batches, MPJPE evaluation."""
    from epipolarpose_tpu.data.h36m import H36MDataset
    from epipolarpose_tpu.data.synthetic import write_synthetic_h36m
    cfg = config
    cfg.MODEL.NUM_JOINTS = 17
    cfg.DATASET.SUBSAMPLE = 1
    write_synthetic_h36m(str(tmp_path), cfg, num_frames=3)
    # the synthetic rig uses camera ids '0'..'3'
    import epipolarpose_tpu.data.h36m as h36m_mod
    orig = h36m_mod.CAMERA_IDS
    h36m_mod.CAMERA_IDS = ("0", "1", "2", "3")
    try:
        ds = H36MDataset(cfg, str(tmp_path), "valid", is_train=False)
        assert len(ds) == 12
        assert len(ds.view_groups) == 3
        assert len(ds.cameras) == 4
        b = ds.get_batch([0, 1])
        assert b["input"].shape == (2, 256, 256, 3)
        assert b["input"].max() > 0.05          # images decoded from zip
        mv = next(ds.view_batches(2, shuffle=False))
        assert mv["input"].shape == (2, 4, 256, 256, 3)
        assert mv["camera"].R.shape == (2, 4, 3, 3)
        # perfect predictions in the EVAL-STEP's output space — (x, y)
        # source pixels + root-relative z — must back-project (undistort +
        # pixel2cam with GT root depth) to ~0 MPJPE + per-action table
        px = np.stack([r.joints for r in ds.records])
        z_rel = np.stack([r.joints_3d[:, 2] - r.joints_3d[0, 2]
                          for r in ds.records])
        preds = np.concatenate([px, z_rel[..., None]], axis=-1)
        name_values, mean = ds.evaluate(cfg, preds)
        assert mean < 1.0, mean      # sub-mm up to undistortion round-trip
        assert "PA-MPJPE" in name_values
        assert ds.perf_higher_is_better is False
    finally:
        h36m_mod.CAMERA_IDS = orig


def test_h36m_dual_crop_native_matches_two_pass(tmp_path):
    """The fused decode-once/warp-twice SS batch path must produce the same
    batch as the two-pass path (clean get_batch + _augmented_crops)."""
    from epipolarpose_tpu.data import fastloader
    import pytest
    if not fastloader.available():
        pytest.skip("native loader unavailable")
    from epipolarpose_tpu.data.h36m import H36MDataset
    from epipolarpose_tpu.data.synthetic import write_synthetic_h36m
    cfg = config
    cfg.MODEL.NUM_JOINTS = 17
    cfg.DATASET.SUBSAMPLE = 1
    cfg.TPU.NATIVE_LOADER = True
    write_synthetic_h36m(str(tmp_path), cfg, num_frames=3)
    import epipolarpose_tpu.data.h36m as h36m_mod
    orig = h36m_mod.CAMERA_IDS
    h36m_mod.CAMERA_IDS = ("0", "1", "2", "3")
    try:
        ds = H36MDataset(cfg, str(tmp_path), "train", is_train=True)
        dual = next(ds.view_batches(2, shuffle=False, augment=True))
        assert dual["input_aug"].shape == dual["input"].shape
        assert dual["input"].dtype == np.uint8

        # two-pass reference with the same seeds (view_batches seed logic)
        flat = [i for g in ds.view_groups[:2] for i in g]
        ds.is_train = False
        ref = ds.get_batch(flat, seed=0)
        ds.is_train = True
        ref.update(ds._augmented_crops(flat, seed=1))
        V = 4
        for k in ("joints", "center", "scale", "aug_M", "aug_flip"):
            np.testing.assert_allclose(
                dual[k].reshape(ref[k].shape), ref[k], atol=1e-5,
                err_msg=k)
        for k in ("input", "input_aug"):
            d = np.abs(dual[k].reshape(ref[k].shape).astype(np.int16)
                       - ref[k].astype(np.int16))
            assert np.median(d) < 2.0, k
            assert (d < 8).mean() > 0.97, k
    finally:
        h36m_mod.CAMERA_IDS = orig
        cfg.TPU.NATIVE_LOADER = "auto"


def test_dual_crop_teacher_scale(tmp_path):
    """TPU.SS_TEACHER_SCALE=0.5: the clean teacher crop comes out at half
    resolution (joints following it into the scaled frame), the augmented
    student crop is bit-identical to the scale-1 run, and the native path
    agrees with the resize fallback."""
    import cv2
    from epipolarpose_tpu.data import fastloader
    from epipolarpose_tpu.data.h36m import H36MDataset
    from epipolarpose_tpu.data.synthetic import write_synthetic_h36m
    cfg = config
    cfg.MODEL.NUM_JOINTS = 17
    cfg.DATASET.SUBSAMPLE = 1
    write_synthetic_h36m(str(tmp_path), cfg, num_frames=3)
    import epipolarpose_tpu.data.h36m as h36m_mod
    orig = h36m_mod.CAMERA_IDS
    h36m_mod.CAMERA_IDS = ("0", "1", "2", "3")
    W, H = (int(v) for v in cfg.MODEL.IMAGE_SIZE)
    try:
        ds = H36MDataset(cfg, str(tmp_path), "train", is_train=True)
        cfg.TPU.NATIVE_LOADER = False
        full = next(ds.view_batches(2, shuffle=False, augment=True))
        cfg.TPU.SS_TEACHER_SCALE = 0.5
        half_fb = next(ds.view_batches(2, shuffle=False, augment=True))
        assert half_fb["input"].shape[2:] == (H // 2, W // 2, 3)
        assert half_fb["input_aug"].shape[2:] == (H, W, 3)
        np.testing.assert_array_equal(half_fb["input_aug"],
                                      full["input_aug"])
        np.testing.assert_allclose(half_fb["joints"][..., :2],
                                   full["joints"][..., :2] * 0.5, atol=1e-4)
        if fastloader.available():
            cfg.TPU.NATIVE_LOADER = True
            half_nat = next(ds.view_batches(2, shuffle=False, augment=True))
            assert half_nat["input"].shape == half_fb["input"].shape
            np.testing.assert_allclose(half_nat["joints"],
                                       half_fb["joints"], atol=1e-4)
            # direct half-res warp vs resize-of-full-res-warp: same image
            # up to resampling (sub-pixel-convention) differences
            ref = np.stack([cv2.resize(im, (W // 2, H // 2),
                                       interpolation=cv2.INTER_LINEAR)
                            for im in full["input"].reshape(-1, H, W, 3)])
            d = np.abs(half_nat["input"].reshape(ref.shape)
                       .astype(np.int16) - ref.astype(np.int16))
            assert np.median(d) < 3.0
    finally:
        h36m_mod.CAMERA_IDS = orig
        cfg.TPU.NATIVE_LOADER = "auto"
        cfg.TPU.SS_TEACHER_SCALE = 1.0


def test_host_shard_indices_partition():
    """Pod DP slicing: per-host slices are disjoint, contiguous, ordered,
    and their union is the global batch."""
    from epipolarpose_tpu.data.joints_dataset import host_shard_indices
    idx = np.random.default_rng(0).permutation(64)
    parts = [host_shard_indices(idx, p, 4) for p in range(4)]
    assert all(len(p) == 16 for p in parts)
    np.testing.assert_array_equal(np.concatenate(parts), idx)
    import pytest
    with pytest.raises(ValueError):
        host_shard_indices(idx, 0, 5)   # 64 % 5 != 0


def test_batches_per_host_slices_cover_global():
    """Every host sees the SAME epoch order and decodes a disjoint 1/P of
    each global batch; concatenating the hosts' 'index' fields reproduces
    the single-process batches exactly."""
    cfg = config
    cfg.DATASET.DATASET = "synthetic"
    ds = SyntheticPoseDataset(cfg, num_samples=32, is_train=True)
    global_batches = [b["index"] for b in ds.batches(8, seed=3)]
    per_host = [[b["index"] for b in ds.batches(
        8, seed=3, process_index=p, process_count=2)] for p in range(2)]
    assert len(per_host[0]) == len(global_batches)
    for gb, h0, h1 in zip(global_batches, per_host[0], per_host[1]):
        assert len(h0) == len(h1) == 4
        np.testing.assert_array_equal(np.concatenate([h0, h1]), gb)


def test_view_batches_per_host_slices():
    cfg = config
    cfg.MODEL.NUM_JOINTS = 17
    ds = SyntheticMultiviewDataset(cfg, num_frames=8, is_train=False)
    full = next(ds.view_batches(4, shuffle=False))
    h = [next(ds.view_batches(4, shuffle=False, process_index=p,
                              process_count=2)) for p in range(2)]
    assert h[0]["input"].shape[0] == 2
    np.testing.assert_array_equal(
        np.concatenate([h[0]["index"], h[1]["index"]]), full["index"])


def test_shard_batch_local_single_process():
    """With one process, shard_batch_local == shard_batch placement."""
    from epipolarpose_tpu.parallel import (make_mesh, shard_batch,
                                           shard_batch_local)
    cfg = config
    mesh = make_mesh(cfg)
    batch = {"input": np.random.default_rng(0).uniform(
        0, 1, (8, 16, 16, 3)).astype(np.float32),
        "joints": np.zeros((8, 17, 2), np.float32)}
    a = shard_batch_local(batch, mesh)
    b = shard_batch(batch, mesh)
    for k in batch:
        assert a[k].sharding == b[k].sharding
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))


def test_grain_loader_matches_thread_loader():
    """grain backend (in-process) must yield the same record coverage and
    batch schema as the default thread-pool path; dataset pickling for
    worker processes round-trips."""
    import pickle
    from epipolarpose_tpu.data import grain_epoch_loader
    cfg = config
    ds = SyntheticPoseDataset(cfg, num_samples=12, is_train=False)
    got = list(grain_epoch_loader(ds, 4, epoch=0, is_train=False,
                                  worker_count=0))
    assert len(got) == 3
    ref = ds.get_batch([0, 1, 2, 3], seed=0)
    assert set(got[0]) >= set(ref) - {"index"} | {"index"}
    for k in ("input", "joints", "joints_vis", "center", "scale"):
        assert got[0][k].shape == ref[k].shape, k
    idx = np.concatenate([b["index"] for b in got])
    np.testing.assert_array_equal(np.sort(idx), np.arange(12))
    # worker-process readiness: pickle round trip rebuilds the pool
    ds2 = pickle.loads(pickle.dumps(ds))
    b = ds2.get_batch([0, 1])
    assert b["input"].shape == (2, 256, 256, 3)


def test_grain_loader_carries_3d_labels_and_pads_eval_tail():
    """Two regressions: (1) grain's per-sample path must ship joints_3d
    (without it, integral depth targets silently become z=0 with full
    weight); (2) eval epochs must keep the remainder, padded to a static
    batch shape like the threads path."""
    from epipolarpose_tpu.data import grain_epoch_loader
    from epipolarpose_tpu.data.synthetic import SyntheticMultiviewDataset
    cfg = config
    ds = SyntheticMultiviewDataset(cfg, num_frames=3, is_train=False,
                                   num_views=2)             # 6 records
    got = list(grain_epoch_loader(ds, 4, epoch=0, is_train=False,
                                  worker_count=0))
    assert len(got) == 2                       # 6 samples -> 4 + padded 4
    for b in got:
        assert "joints_3d" in b, "grain batches must carry 3D labels"
        assert b["joints_3d"].shape == (4, cfg.MODEL.NUM_JOINTS, 3)
        assert b["input"].shape[0] == 4        # static (padded) shape
    idx = np.concatenate([b["index"] for b in got])
    assert set(idx.tolist()) == set(range(6))  # full coverage
    np.testing.assert_array_equal(idx[6:], idx[5])  # tail pads last sample
    # train epochs still drop the remainder (reference drop_last)
    got_tr = list(grain_epoch_loader(ds, 4, epoch=0, is_train=True,
                                     worker_count=0))
    assert len(got_tr) == 1


def test_shard_batch_local_rejects_non_divisible():
    """Pod DP: a per-sample leaf whose global batch doesn't divide the data
    axis must raise, not silently pass divergent host data as replicated."""
    import pytest
    from epipolarpose_tpu.parallel import make_mesh, shard_batch_local
    mesh = make_mesh(config)
    data = mesh.shape["data"]
    if data <= 2:
        pytest.skip("needs a data axis > 2 to build a non-divisible case")
    # local batch of 1 on 2 hosts -> global 2, never divisible by data > 2;
    # the check fires before any jax.Array is built, so a single process
    # can exercise the multi-process validation path
    bad = {"input": np.zeros((1, 4, 4, 3), np.float32)}
    with pytest.raises(ValueError, match="not divisible"):
        shard_batch_local(bad, mesh, process_count=2)


def test_epoch_loader_grain_backend():
    cfg = config
    cfg.TPU.LOADER = "grain"
    cfg.TPU.GRAIN_WORKERS = 0      # worker procs need a script __main__
    try:
        from epipolarpose_tpu.data import epoch_loader
        ds = SyntheticPoseDataset(cfg, num_samples=8, is_train=True)
        batches = list(epoch_loader(ds, 4, epoch=1))
        assert len(batches) == 2
        import jax
        assert isinstance(batches[0]["input"], jax.Array)
    finally:
        cfg.TPU.LOADER = "threads"
        cfg.TPU.GRAIN_WORKERS = -1


def test_grain_multiprocess_workers(tmp_path):
    """Worker PROCESSES (the reference-DataLoader analogue) validated from
    a real script __main__ (multiprocessing spawn re-imports it, which is
    why this can't run inline under pytest)."""
    import pathlib
    import subprocess
    import sys
    root = pathlib.Path(__file__).resolve().parents[1]
    script = tmp_path / "grain_mp_check.py"
    script.write_text(f"""
import sys
sys.path.insert(0, {str(root)!r})
if __name__ == "__main__":
    from epipolarpose_tpu.config import config as cfg
    from epipolarpose_tpu.data import SyntheticPoseDataset
    from epipolarpose_tpu.data.grain_pipeline import grain_epoch_loader
    ds = SyntheticPoseDataset(cfg, num_samples=8, is_train=True)
    got = list(grain_epoch_loader(ds, 4, epoch=1, is_train=True,
                                  worker_count=2))
    assert len(got) == 2 and got[0]["input"].shape == (4, 256, 256, 3)
    print("MP-GRAIN-OK")
""")
    from util import cpu_env
    env = cpu_env()
    out = subprocess.run([sys.executable, str(script)], text=True,
                         capture_output=True, env=env, timeout=300)
    assert "MP-GRAIN-OK" in out.stdout, out.stderr[-2000:]


def test_h36m_subsample_keeps_view_groups(tmp_path):
    """SUBSAMPLE must stride over time instants, keeping all 4 views of
    every Nth frame — a flat per-record stride keeps one camera of frame
    0, one of frame 1, ... and destroys EVERY multi-view group (found by
    the SS input-fed bench: zero batches)."""
    from epipolarpose_tpu.config import config as cfg
    from epipolarpose_tpu.data import write_synthetic_h36m
    from epipolarpose_tpu.data.h36m import CAMERA_IDS, H36MDataset
    cfg.MODEL.NUM_JOINTS = 17
    write_synthetic_h36m(str(tmp_path), cfg, num_frames=10,
                         camera_ids=CAMERA_IDS)
    cfg.DATASET.SUBSAMPLE = 5
    try:
        ds = H36MDataset(cfg, str(tmp_path), "train", is_train=True)
        # frames 0 and 5 survive, each with all 4 views
        assert len(ds.view_groups) == 2, len(ds.view_groups)
        assert len(ds.records) == 8
        frames = sorted({ds.records[g[0]].meta["frame"]
                         for g in ds.view_groups})
        assert frames == [0, 5], frames
        for g in ds.view_groups:
            assert len(g) == len(CAMERA_IDS)
        # and the multi-view batcher actually yields a batch
        b = next(ds.view_batches(2, shuffle=False))
        assert b["input"].shape[:2] == (2, 4)
    finally:
        cfg.DATASET.SUBSAMPLE = 1


def test_two_stage_prefetch_orders_and_overlaps():
    """host_prefetch -> device_prefetch chaining (the two-stage input
    pipeline epoch_loader builds): order preserved, both stages actually
    run concurrently with the consumer, errors propagate through both."""
    import threading
    import time
    from epipolarpose_tpu.data.pipeline import host_prefetch

    produced = []

    def gen():
        for i in range(6):
            produced.append(i)
            time.sleep(0.05)
            yield {"x": np.full(3, i, np.float32)}

    it = device_prefetch(host_prefetch(gen(), size=2), size=2)
    first = next(it)
    # with two decoupled stages + queues, the source should have run
    # ahead of the single consumed batch
    time.sleep(0.4)
    assert len(produced) >= 3, produced
    rest = list(it)
    vals = [int(np.asarray(b["x"])[0]) for b in [first] + rest]
    assert vals == list(range(6)), vals

    def bad():
        yield {"x": np.zeros(3)}
        raise RuntimeError("boom2")

    it = device_prefetch(host_prefetch(bad(), size=1), size=1)
    next(it)
    import pytest
    with pytest.raises(RuntimeError, match="boom2"):
        next(it)


def test_two_stage_prefetch_abandon_releases_upstream():
    """Abandoning the device stage must also stop the host stage's
    producer (the stage closes its upstream iterator on exit)."""
    import time
    from epipolarpose_tpu.data.pipeline import host_prefetch
    produced = []

    def gen():
        for i in range(200):
            produced.append(i)
            yield {"x": np.full(3, i)}

    it = device_prefetch(host_prefetch(gen(), size=1), size=1)
    next(it)
    it.close()
    time.sleep(1.0)
    stalled_at = len(produced)
    time.sleep(1.2)
    assert len(produced) == stalled_at < 200, \
        "upstream producer kept running after abandonment"
