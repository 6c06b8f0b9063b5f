"""Datasets: MPII / H36M readers, synthetic rigs, device feeding.

Registry mirrors the reference's ``dataset.<name>(cfg, root, image_set,
is_train, transform)`` surface (lib/dataset/__init__.py [H]); the transform
argument is gone — normalization happens on device.
"""

from epipolarpose_tpu.data.joints_dataset import (  # noqa: F401
    IMAGENET_MEAN,
    IMAGENET_STD,
    JointsDataset,
    JointsRecord,
)
from epipolarpose_tpu.data.mpii import MPIIDataset  # noqa: F401
from epipolarpose_tpu.data.h36m import H36MDataset  # noqa: F401
from epipolarpose_tpu.data.mpi3dhp import MPI3DHPDataset  # noqa: F401
from epipolarpose_tpu.data.synthetic import (  # noqa: F401
    SyntheticMultiviewDataset,
    SyntheticPoseDataset,
    write_synthetic_h36m,
    write_synthetic_mpii,
)
from epipolarpose_tpu.data.pipeline import (  # noqa: F401
    device_prefetch,
    epoch_loader,
)
from epipolarpose_tpu.data.grain_pipeline import (  # noqa: F401
    grain_epoch_loader,
)

_REGISTRY = {
    "mpii": MPIIDataset,
    "h36m": H36MDataset,
    "mpi_inf_3dhp": MPI3DHPDataset,
    "synthetic": SyntheticPoseDataset,
    "synthetic_multiview": SyntheticMultiviewDataset,
}


def get_dataset(cfg, image_set: str, is_train: bool, **kwargs):
    """Build the dataset named by ``cfg.DATASET.DATASET``."""
    name = cfg.DATASET.DATASET
    if name not in _REGISTRY:
        raise ValueError(f"unknown DATASET.DATASET: {name}")
    cls = _REGISTRY[name]
    if name.startswith("synthetic"):
        return cls(cfg, is_train=is_train, **kwargs)
    return cls(cfg, cfg.DATASET.ROOT, image_set, is_train, **kwargs)
