"""Config system mirroring the reference's ``lib/core/config.py`` schema.

The reference (mkocabas/EpipolarPose ``lib/core/config.py`` — see SURVEY.md
§2.A, schema confidence [H]) keeps a module-level EasyDict of defaults that
YAML experiment files are merged into via ``update_config``.  The YAML key
schema is part of the public surface (experiment files under
``experiments/{h36m,mpii}/*.yaml`` must keep working), so we mirror the keys
1:1 here on top of a light attribute-dict.

TPU-specific additions live under ``TPU.*`` and are additive only — every
reference key keeps its meaning.  ``GPUS`` is reinterpreted as "number of
accelerator devices" for mesh construction (the reference used it as a CUDA
device-id string for ``nn.DataParallel``).
"""

from __future__ import annotations

import copy
import os
import pathlib
from typing import Any

import yaml


class ConfigDict(dict):
    """dict with attribute access (EasyDict-alike, but tiny and typed)."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def __deepcopy__(self, memo):
        return ConfigDict({k: copy.deepcopy(v, memo) for k, v in self.items()})


def _default_config() -> ConfigDict:
    c = ConfigDict()

    # ------------------------------------------------------------- top level
    c.OUTPUT_DIR = "output"
    c.LOG_DIR = "log"
    c.DATA_DIR = ""
    c.GPUS = "0"          # reference: CUDA ids; here: parsed into device count
    c.WORKERS = 4
    c.PRINT_FREQ = 100

    # cudnn knobs kept for YAML compatibility; no-ops on TPU.
    c.CUDNN = ConfigDict()
    c.CUDNN.BENCHMARK = True
    c.CUDNN.DETERMINISTIC = False
    c.CUDNN.ENABLED = True

    # ---------------------------------------------------------------- model
    c.MODEL = ConfigDict()
    c.MODEL.NAME = "pose_resnet"
    c.MODEL.INIT_WEIGHTS = True
    c.MODEL.PRETRAINED = ""
    c.MODEL.NUM_JOINTS = 16
    c.MODEL.IMAGE_SIZE = [256, 256]           # [w, h]
    c.MODEL.STYLE = "pytorch"

    c.MODEL.EXTRA = ConfigDict()
    c.MODEL.EXTRA.TARGET_TYPE = "gaussian"
    c.MODEL.EXTRA.HEATMAP_SIZE = [64, 64]     # [w, h]
    c.MODEL.EXTRA.SIGMA = 2
    c.MODEL.EXTRA.FINAL_CONV_KERNEL = 1
    c.MODEL.EXTRA.DECONV_WITH_BIAS = False
    c.MODEL.EXTRA.NUM_DECONV_LAYERS = 3
    c.MODEL.EXTRA.NUM_DECONV_FILTERS = [256, 256, 256]
    c.MODEL.EXTRA.NUM_DECONV_KERNELS = [4, 4, 4]
    c.MODEL.EXTRA.NUM_LAYERS = 50
    # 3D / integral variant (reference gates on these — SURVEY §3.3 [M]):
    c.MODEL.EXTRA.DEPTH_DIM = 1               # >1 => volumetric 3D head
    c.MODEL.EXTRA.DEPTH_BOUND = 1000.0        # ± mm mapped to z ∈ [-.5, .5)
    c.MODEL.EXTRA.AGGRE = False

    # ---------------------------------------------------------------- loss
    c.LOSS = ConfigDict()
    c.LOSS.USE_TARGET_WEIGHT = True
    c.LOSS.TYPE = "JointsMSELoss"             # or "IntegralL1Loss"

    # -------------------------------------------------------------- dataset
    c.DATASET = ConfigDict()
    c.DATASET.ROOT = ""
    c.DATASET.DATASET = "mpii"
    c.DATASET.TRAIN_SET = "train"
    c.DATASET.TEST_SET = "valid"
    c.DATASET.DATA_FORMAT = "jpg"
    c.DATASET.HYBRID_JOINTS_TYPE = ""
    c.DATASET.SELECT_DATA = False
    # training data augmentation:
    c.DATASET.FLIP = True
    c.DATASET.SCALE_FACTOR = 0.25
    c.DATASET.ROT_FACTOR = 30
    # h36m self-supervision source: 'gt' | 'triangulated' (SURVEY §2.A [M])
    c.DATASET.LABEL_SOURCE = "gt"
    c.DATASET.NUM_VIEWS = 4
    c.DATASET.SUBSAMPLE = 1
    # 3DHP transfer eval: map the model's H36M joint order onto 3DHP's
    c.DATASET.MAP_H36M_JOINTS = True

    # ---------------------------------------------------------------- train
    c.TRAIN = ConfigDict()
    c.TRAIN.LR_FACTOR = 0.1
    c.TRAIN.LR_STEP = [90, 110]
    c.TRAIN.LR = 0.001
    c.TRAIN.OPTIMIZER = "adam"
    c.TRAIN.MOMENTUM = 0.9
    c.TRAIN.WD = 0.0001
    c.TRAIN.NESTEROV = False
    c.TRAIN.GAMMA1 = 0.99
    c.TRAIN.GAMMA2 = 0.0
    c.TRAIN.BEGIN_EPOCH = 0
    c.TRAIN.END_EPOCH = 140
    c.TRAIN.RESUME = False
    c.TRAIN.CHECKPOINT = ""
    c.TRAIN.BATCH_SIZE = 32                   # per device
    c.TRAIN.SHUFFLE = True

    # ----------------------------------------------------------------- test
    c.TEST = ConfigDict()
    c.TEST.BATCH_SIZE = 32
    c.TEST.FLIP_TEST = False
    c.TEST.POST_PROCESS = True
    c.TEST.SHIFT_HEATMAP = True
    c.TEST.USE_GT_BBOX = False
    c.TEST.MODEL_FILE = ""

    # ---------------------------------------------------------------- debug
    c.DEBUG = ConfigDict()
    c.DEBUG.DEBUG = False
    c.DEBUG.SAVE_BATCH_IMAGES_GT = False
    c.DEBUG.SAVE_BATCH_IMAGES_PRED = False
    c.DEBUG.SAVE_HEATMAPS_GT = False
    c.DEBUG.SAVE_HEATMAPS_PRED = False

    # ------------------------------------------------ TPU-native (additive)
    c.TPU = ConfigDict()
    c.TPU.MESH = ConfigDict()
    c.TPU.MESH.DATA = -1         # -1: all devices on the data axis
    c.TPU.MESH.MODEL = 1
    c.TPU.COMPUTE_DTYPE = "bfloat16"
    c.TPU.PARAM_DTYPE = "float32"
    c.TPU.REMAT = False          # jax.checkpoint the backbone (384² configs)
    c.TPU.DONATE = True
    c.TPU.PREFETCH = 2           # device-prefetch depth for the host pipeline
    # optimizer steps per host dispatch: K>1 scans the train step over a
    # K-stacked super-batch, amortizing per-step dispatch latency (crucial
    # on high-RTT host<->device links); 1 = reference-like per-batch steps
    c.TPU.FUSED_STEPS = 1
    c.TPU.SEED = 0
    c.TPU.CHECKPOINT_EVERY = 0   # steps; 0 = per-epoch only
    c.TPU.TRIANGULATION = ConfigDict()
    c.TPU.TRIANGULATION.METHOD = "fast"    # 'fast' | 'eigh' | 'svd'
    c.TPU.TRIANGULATION.CONF_WEIGHT = True
    # joints whose teacher confidence (min across views) falls below this
    # produce zero-weight student targets in the self-supervised loop
    c.TPU.SS_CONF_MIN = 0.05
    # camera knowledge for self-supervision: 'given' uses dataset extrinsics;
    # 'estimated' recovers the rig from teacher detections via the essential
    # matrix (paper's calibration-free mode); scale fixed by mean bone
    # length when SS_BONE_LENGTH_MM > 0, else unit (0,1)-baseline
    c.TPU.SS_CAMERAS = "given"
    c.TPU.SS_BONE_LENGTH_MM = 0.0
    # teacher-crop resolution multiplier for the dual-crop SS path: the
    # frozen teacher only feeds a heatmap argmax, so its clean crop can
    # shrink (0.5 -> 4x fewer warp pixels + h2d bytes for that half of the
    # batch). Pseudo-GT precision cost vs savings measured in
    # docs/PROFILE_r4.md; 1.0 = reference-equivalent full-res crops
    c.TPU.SS_TEACHER_SCALE = 1.0
    # C++ fused decode+warp batch path: True / False / "auto" (one-shot
    # per-host calibration picks the measured-fastest path)
    c.TPU.NATIVE_LOADER = "auto"
    # host input backend: "threads" (pool + C++ fastloader, default) or
    # "grain" (multi-process workers, SURVEY §2.C plan — for many-core
    # hosts with GIL-bound sources)
    c.TPU.LOADER = "threads"
    # grain worker processes: -1 = auto (WORKERS - 1); 0 = in-process.
    # NOTE worker processes require a proper script __main__ (spawn
    # re-imports it) — in-process is used automatically under pytest.
    c.TPU.GRAIN_WORKERS = -1
    # orbax checkpoint of a trained refinement unit; when set, pseudo-GT is
    # refined in the SS loop before supervising the student ("SS + R")
    c.TPU.SS_REFINER = ""
    return c


config: ConfigDict = _default_config()


def _merge(dst: ConfigDict, src: dict, path: str = "") -> None:
    for k, v in src.items():
        here = f"{path}.{k}" if path else k
        if k not in dst:
            raise KeyError(f"unknown config key: {here}")
        if isinstance(v, dict):
            if not isinstance(dst[k], dict):
                raise TypeError(f"{here}: scalar overridden by mapping")
            _merge(dst[k], v, here)
        else:
            if isinstance(dst[k], dict):
                # e.g. an accidentally-emptied YAML section parses as
                # None — fail loudly here, not with a far-away
                # AttributeError at first use
                raise TypeError(f"{here}: mapping overridden by "
                                f"scalar {v!r}")
            dst[k] = v


def update_config(config_file: str | os.PathLike) -> ConfigDict:
    """Merge a YAML experiment file into the global ``config`` (in place).

    Mirrors reference ``update_config`` (lib/core/config.py [H]): unknown keys
    raise, nested mappings merge recursively.
    """
    with open(config_file) as f:
        exp = yaml.safe_load(f)
    if exp:
        _merge(config, exp)
    return config


def reset_config() -> ConfigDict:
    """Restore defaults (test helper; the reference module is import-global)."""
    fresh = _default_config()
    config.clear()
    config.update(fresh)
    return config


def update_dir(cfg: ConfigDict, model_dir: str | None = None,
               log_dir: str | None = None, data_dir: str | None = None) -> None:
    """Rebase output/log/data dirs (reference ``update_dir`` [H])."""
    if model_dir:
        cfg.OUTPUT_DIR = model_dir
    if log_dir:
        cfg.LOG_DIR = log_dir
    if data_dir:
        cfg.DATA_DIR = data_dir
        cfg.DATASET.ROOT = os.path.join(data_dir, cfg.DATASET.ROOT)
        # empty values must STAY empty: joining '' would produce the
        # truthy '<data_dir>/' and flip downstream `if MODEL_FILE:` gates
        if cfg.TEST.MODEL_FILE:
            cfg.TEST.MODEL_FILE = os.path.join(data_dir,
                                               cfg.TEST.MODEL_FILE)
        if cfg.MODEL.PRETRAINED:
            cfg.MODEL.PRETRAINED = os.path.join(data_dir,
                                                cfg.MODEL.PRETRAINED)


def get_model_name(cfg: ConfigDict) -> tuple[str, str]:
    """Build (name, full_name) run identifiers.

    Mirrors reference ``get_model_name`` (lib/core/config.py [H]):
    e.g. ``pose_resnet_50`` / ``pose_resnet_50_256x256_d64``.
    """
    name = cfg.MODEL.NAME
    extra = cfg.MODEL.EXTRA
    if name in ("pose_resnet", "pose3d_resnet"):
        name = f"{cfg.MODEL.NAME}_{extra.NUM_LAYERS}"
        full_name = (f"{name}_{cfg.MODEL.IMAGE_SIZE[1]}x{cfg.MODEL.IMAGE_SIZE[0]}")
        if int(extra.get("DEPTH_DIM", 1)) > 1:
            full_name = f"{full_name}_d{extra.DEPTH_DIM}"
    else:
        raise ValueError(f"unknown model: {cfg.MODEL.NAME}")
    return name, full_name


def num_devices(cfg: ConfigDict) -> int:
    """Device count implied by GPUS ('0,1,2,3' -> 4) or TPU.MESH."""
    data = cfg.TPU.MESH.DATA
    if data and data > 0:
        return int(data) * max(1, int(cfg.TPU.MESH.MODEL))
    gpus = str(cfg.GPUS)
    return max(1, len([g for g in gpus.split(",") if g != ""]))


def load_config(config_file: str | os.PathLike) -> ConfigDict:
    """Pure variant: return a fresh merged ConfigDict, leave globals alone."""
    cfg = _default_config()
    with open(config_file) as f:
        exp = yaml.safe_load(f)
    if exp:
        _merge(cfg, exp)
    return cfg


def save_config(cfg: ConfigDict, path: str | os.PathLike) -> None:
    def plain(d):
        return {k: plain(v) if isinstance(v, dict) else v for k, v in d.items()}
    pathlib.Path(path).write_text(yaml.safe_dump(plain(cfg), sort_keys=False))
