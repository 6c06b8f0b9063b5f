"""epipolarpose_tpu — a TPU-native rebuild of EpipolarPose.

A JAX/XLA/Pallas framework for self-supervised 3D human pose estimation via
epipolar geometry (Kocabas et al., CVPR 2019, arXiv:1903.02330), re-designed
TPU-first rather than ported from the PyTorch reference:

- models:    Flax ResNet-{18,34,50,101,152} + deconv heatmap heads (2D) and
             integral soft-argmax volumetric regressors (3D), NHWC + bf16.
- ops:       on-device heatmap target generation, soft-argmax decode,
             cv2-compatible affine crop/warp, losses, metrics.
- geometry:  batched camera model (radial+tangential distortion), batched
             multi-view DLT/SVD triangulation, essential-matrix recovery,
             Procrustes alignment — all vmappable jnp, run on TPU.
- data:      MPII / H36M readers (host decode only), synthetic rigs,
             double-buffered device feeding.
- core:      train/validate loops, orbax checkpointing, config system that
             mirrors the reference YAML schema.
- parallel:  data-parallel (and spatial) sharding over a jax Mesh.

Reference public surface mirrored (see SURVEY.md):
  lib/core/config.py  -> epipolarpose_tpu.config
  lib/core/function.py-> epipolarpose_tpu.core.function
  lib/models          -> epipolarpose_tpu.models
  lib/dataset         -> epipolarpose_tpu.data
  lib/utils           -> epipolarpose_tpu.{geometry,ops,utils}
"""

__version__ = "0.1.0"

from epipolarpose_tpu.config import config, update_config, get_model_name  # noqa: F401
