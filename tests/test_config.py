"""Config system tests (mirrors reference lib/core/config.py surface)."""

import pathlib

import pytest

from epipolarpose_tpu.config import (
    config, get_model_name, load_config, num_devices, reset_config,
    update_config,
)

EXP = pathlib.Path(__file__).resolve().parents[1] / "experiments"


def test_defaults_present():
    assert config.MODEL.NUM_JOINTS == 16
    assert config.MODEL.EXTRA.HEATMAP_SIZE == [64, 64]
    assert config.TRAIN.LR == 0.001
    assert config.TEST.POST_PROCESS is True
    assert config.DATASET.SCALE_FACTOR == 0.25


@pytest.mark.parametrize("yaml_file", sorted(EXP.glob("*/*.yaml")),
                         ids=lambda p: f"{p.parent.name}/{p.name}")
def test_all_experiment_yamls_load(yaml_file):
    cfg = load_config(yaml_file)
    assert cfg.MODEL.NAME in ("pose_resnet", "pose3d_resnet")
    name, full = get_model_name(cfg)
    assert str(cfg.MODEL.EXTRA.NUM_LAYERS) in name


def test_update_config_merges_globally():
    update_config(EXP / "h36m" / "train_ss_r50_256_integral.yaml")
    assert config.DATASET.LABEL_SOURCE == "triangulated"
    assert config.MODEL.EXTRA.DEPTH_DIM == 64
    reset_config()
    assert config.MODEL.EXTRA.DEPTH_DIM == 1


def test_unknown_key_rejected(tmp_path):
    bad = tmp_path / "bad.yaml"
    bad.write_text("MODLE:\n  NAME: pose_resnet\n")
    with pytest.raises(KeyError):
        load_config(bad)


def test_model_name_3d():
    cfg = load_config(EXP / "h36m" / "train_fs_r50_256_integral.yaml")
    name, full = get_model_name(cfg)
    assert name == "pose3d_resnet_50"
    assert full == "pose3d_resnet_50_256x256_d64"


def test_num_devices_from_gpus():
    cfg = load_config(EXP / "h36m" / "train_fs_r152_384_integral.yaml")
    # TPU.MESH.DATA = -1 -> fall back to GPUS count
    assert num_devices(cfg) == 8
