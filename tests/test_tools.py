"""tools/prepare_h36m.py conversion logic on fabricated inputs."""

import json
import subprocess
import sys
import pathlib

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT / "tools"))


def test_convert_annotations_aliases(tmp_path):
    from prepare_h36m import convert_annotations
    raw = [{
        "img_path": "S1/img_000001.jpg",
        "c": [500.0, 400.0],
        "s": 2.1,
        "joint_img": [[10.0, 20.0, 0.5]] * 17,
        "joint_cam": [[1.0, 2.0, 3.0]] * 17,
        "s_id": 1, "act_id": 2, "subact_id": 1, "cam_id": "54138969",
        "image_id": 7,
    }]
    src = tmp_path / "raw.json"
    src.write_text(json.dumps(raw))
    out = convert_annotations(str(src))
    assert len(out) == 1
    r = out[0]
    assert r["image"] == "S1/img_000001.jpg"
    assert r["scale"] == [2.1, 2.1]
    assert np.asarray(r["joints_2d"]).shape == (17, 2)
    assert np.asarray(r["joints_3d"]).shape == (17, 3)
    assert r["camera"] == "54138969" and r["frame"] == 7


def test_convert_cameras_h5(tmp_path):
    import h5py
    from scipy.spatial.transform import Rotation
    from prepare_h36m import convert_cameras_h5
    path = tmp_path / "cameras.h5"
    # NON-symmetric rotation, stored MATLAB-style (i.e. transposed — the
    # una-dinosauria loader applies R = R.T after reading); camera id as
    # the uint16 char-code 'Name' array the real file uses
    R_true = Rotation.from_euler("xyz", [10, 20, 30],
                                 degrees=True).as_matrix()
    with h5py.File(path, "w") as f:
        g = f.create_group("subject1/camera1")
        g["R"] = R_true.T
        g["Name"] = np.frombuffer("54138969".encode("utf-16-le"),
                                  np.uint16)
        g["T"] = np.array([1.0, 2.0, 3.0])
        g["f"] = np.array([1100.0, 1101.0])
        g["c"] = np.array([512.0, 510.0])
        g["k"] = np.array([-0.2, 0.2, -0.001])
        g["p"] = np.array([0.001, -0.0005])
    cams = convert_cameras_h5(str(path))
    key = next(iter(cams))
    assert key == "1:54138969"
    np.testing.assert_allclose(np.asarray(cams[key]["R"]), R_true,
                               atol=1e-12)
    # loads through the real reader
    from epipolarpose_tpu.data.h36m import load_cameras
    out = tmp_path / "cameras.json"
    out.write_text(json.dumps(cams))
    loaded = load_cameras(str(out))
    assert np.allclose(loaded[key].f, [1100.0, 1101.0])


def test_decode_camera_name_dtypes():
    """'Name' decode across export dtypes: uint16 UTF-16-LE code units,
    uint8 ASCII, numeric char codes from MATLAB/scipy re-exports
    (int16/int32/float64 — raw-digit concatenation would build a wrong
    but plausible id like '5352...'), and a literal numeric id."""
    from prepare_h36m import _decode_camera_name
    want = "54138969"
    codes = [ord(c) for c in want]
    assert _decode_camera_name(
        np.frombuffer(want.encode("utf-16-le"), np.uint16)) == want
    assert _decode_camera_name(np.array(codes, np.uint8)) == want
    for dt in (np.int16, np.int32, np.float64):
        assert _decode_camera_name(np.array(codes, dt)) == want
    assert _decode_camera_name(np.array([54138969], np.int64)) == want
    assert _decode_camera_name(np.array(list(want), "U1")) == want


def test_export_torch_cli_pth_resave(tmp_path):
    """tools/export_torch.py end-to-end on the .pth re-save branch (the
    conversion math itself is oracle-tested in test_models.py)."""
    import os
    import torch
    sys.path.insert(0, str(ROOT))
    from epipolarpose_tpu.models import save_torch_checkpoint
    from epipolarpose_tpu.models.pose_resnet import (PoseResNet,
                                                     init_pose_net)
    import jax
    import jax.numpy as jnp
    model = PoseResNet(num_layers=18, num_joints=17, dtype=jnp.float32,
                       depth_dim=8, num_deconv_filters=(64, 64, 64))
    params, stats = init_pose_net(model, jax.random.PRNGKey(0), (64, 64))
    src = tmp_path / "in.pth.tar"
    save_torch_checkpoint(str(src), {"params": params,
                                     "batch_stats": stats})
    dst = tmp_path / "out.pth.tar"
    from util import cpu_env
    env = cpu_env()
    r = subprocess.run(
        [sys.executable, str(ROOT / "tools" / "export_torch.py"),
         "--cfg", str(ROOT / "experiments/debug/synth_smoke_3d.yaml"),
         "--model-file", str(src), "--out", str(dst)],
        text=True, capture_output=True, env=env, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    a = torch.load(str(src), map_location="cpu",
                   weights_only=True)["state_dict"]
    b = torch.load(str(dst), map_location="cpu",
                   weights_only=True)["state_dict"]
    assert sorted(a) == sorted(b)
    for k in a:
        np.testing.assert_array_equal(a[k].numpy(), b[k].numpy(), err_msg=k)


def test_cli_end_to_end(tmp_path):
    raw = [{"image": "a.jpg", "center": [1, 2], "scale": 1.0,
            "joints_2d": [[0, 0]] * 17, "subject": 1, "action": "X",
            "subaction": 1, "camera": "54138969", "frame": 0}]
    src = tmp_path / "t.json"
    src.write_text(json.dumps(raw))
    out = tmp_path / "annot"
    r = subprocess.run(
        [sys.executable, str(ROOT / "tools" / "prepare_h36m.py"),
         "--train-annot", str(src), "--out", str(out)],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    assert (out / "train.json").exists()


def test_export_serve_roundtrip():
    """jax.export serving artifact: serialize the full inference
    computation (weights baked in), deserialize WITHOUT framework code,
    and get identical outputs — including a symbolic-batch export served
    at two different batch sizes."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import export as jexp
    from export_model import build_predict_fn, export_model
    from epipolarpose_tpu.config import config as cfg
    from epipolarpose_tpu.core import create_train_state
    from epipolarpose_tpu.models import get_model

    cfg.MODEL.NAME = "pose3d_resnet"
    cfg.MODEL.NUM_JOINTS = 17
    cfg.MODEL.IMAGE_SIZE = [64, 64]
    cfg.MODEL.EXTRA.HEATMAP_SIZE = [16, 16]
    cfg.MODEL.EXTRA.NUM_LAYERS = 18
    cfg.MODEL.EXTRA.NUM_DECONV_FILTERS = [32, 32, 32]
    cfg.MODEL.EXTRA.TARGET_TYPE = "integral"
    cfg.MODEL.EXTRA.DEPTH_DIM = 4
    cfg.TPU.COMPUTE_DTYPE = "float32"
    model = get_model(cfg, is_train=False)
    st = create_train_state(cfg, model, jax.random.PRNGKey(0), 1)

    exported = export_model(cfg, (st.params, st.batch_stats), batch_size=-1)
    blob = exported.serialize()
    assert len(blob) > 1000

    restored = jexp.deserialize(blob)
    rng = np.random.default_rng(0)
    ref_fn = build_predict_fn(cfg, (st.params, st.batch_stats))
    for n in (2, 5):                      # symbolic batch: two sizes
        x = jnp.asarray(rng.uniform(0, 1, (n, 64, 64, 3)), jnp.float32)
        got = restored.call(x)
        ref = ref_fn(x)
        assert got.shape == (n, 17, 3)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5)


def test_convert_cameras_h5_ascii_name(tmp_path):
    """ADVICE r2: an h5 whose 'name' is ASCII/uint8 (not MATLAB's uint16
    char codes) must decode to the right camera id, not garbage that
    silently falls back to positional CAMERA_IDS."""
    import h5py
    from prepare_h36m import convert_cameras_h5
    path = tmp_path / "cameras.h5"
    with h5py.File(path, "w") as f:
        # camera2 slot but named 54138969: positional fallback would
        # mis-key it as CAMERA_IDS[1] = 55011271
        g = f.create_group("subject1/camera2")
        g["name"] = np.frombuffer(b"54138969", np.uint8)
        g["R"] = np.eye(3)
        g["T"] = np.zeros(3)
        g["f"] = np.array([1000.0, 1000.0])
        g["c"] = np.array([500.0, 500.0])
        g["k"] = np.zeros(3)
        g["p"] = np.zeros(2)
    cams = convert_cameras_h5(str(path))
    assert list(cams) == ["1:54138969"]


def test_profile_fused_matmul_stats_kernel():
    """tools/profile_step.py's Mosaic experiment kernel (interpret mode):
    y = x @ w with a fused (sum, sum-of-squares) stats epilogue must match
    the XLA reference bit-for-bit-ish, so re-running the headroom
    experiment after a toolchain bump measures perf, not bugs."""
    import numpy as np
    from profile_step import fused_matmul_stats, xla_matmul_stats
    rng = np.random.default_rng(0)
    x = rng.standard_normal((64, 16)).astype(np.float32)
    w = rng.standard_normal((16, 32)).astype(np.float32)
    y_f, s_f = fused_matmul_stats(x, w, tile_m=16, tile_n=16,
                                  interpret=True)
    y_x, s_x = xla_matmul_stats(x, w)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_x),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s_f), np.asarray(s_x),
                               rtol=1e-4, atol=1e-4)
