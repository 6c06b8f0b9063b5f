"""Model registry mirroring the reference's name-based lookup.

Reference pattern: ``eval('models.' + cfg.MODEL.NAME + '.get_pose_net')``
(lib/models/__init__.py — SURVEY.md §2.A [H]); here a plain dict registry.
``pose_resnet`` (2D) and ``pose3d_resnet`` (integral 3D) are the same Flax
module with ``depth_dim`` 1 vs >1.
"""

from epipolarpose_tpu.models.pose_resnet import (  # noqa: F401
    PoseResNet,
    get_pose_net,
    init_pose_net,
)
from epipolarpose_tpu.models.refiner import PoseRefiner  # noqa: F401
from epipolarpose_tpu.models.torch_convert import (  # noqa: F401
    convert_state_dict,
    export_state_dict,
    load_torch_checkpoint,
    save_torch_checkpoint,
)

_REGISTRY = {
    "pose_resnet": get_pose_net,
    "pose3d_resnet": get_pose_net,
}


def get_model(cfg, is_train: bool = True):
    """Look up and build the model named by ``cfg.MODEL.NAME``."""
    name = cfg.MODEL.NAME
    if name not in _REGISTRY:
        raise ValueError(f"unknown MODEL.NAME: {name}")
    return _REGISTRY[name](cfg, is_train)
