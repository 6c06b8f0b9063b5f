"""Misc utilities: visualization, debug-image dumps."""

from epipolarpose_tpu.utils.vis import (  # noqa: F401
    save_batch_heatmaps,
    save_batch_image_with_joints,
    save_debug_images,
    plot_3d_skeleton,
)
