"""On-device array ops: heatmap targets, soft-argmax, warps, losses, metrics.

Replaces the reference's host-side per-sample numpy/cv2 work
(JointsDataset.generate_target, lib/core/{inference,loss,evaluate}.py — see
SURVEY.md §2.A) with batched jnp that fuses into the jitted train step, per
BASELINE.json's north star ("heatmap target generation fused into an on-TPU
preprocessing stage").
"""

from epipolarpose_tpu.ops.heatmap import (  # noqa: F401
    generate_target,
    get_final_preds,
    get_max_preds,
)
from epipolarpose_tpu.ops.integral import (  # noqa: F401
    generate_integral_target,
    softmax_integral,
)
from epipolarpose_tpu.ops.losses import (  # noqa: F401
    integral_l1_loss,
    joints_mse_loss,
    make_loss,
)
from epipolarpose_tpu.ops.metrics import (  # noqa: F401
    heatmap_accuracy,
    mpjpe,
    nmpjpe,
    pa_mpjpe,
    pck,
    pckh,
    pss,
)
from epipolarpose_tpu.ops.warp import (  # noqa: F401
    warp_affine,
    warp_affine_separable,
)
