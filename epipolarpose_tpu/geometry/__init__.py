"""Geometry core: pure-jnp, fully vmappable coordinate math.

Replaces the reference's host-side numpy/OpenCV geometry
(lib/utils/{transforms,prep_h36m,triangulation}.py — SURVEY.md §2.A) with
batched on-device equivalents.
"""

from epipolarpose_tpu.geometry.affine import (  # noqa: F401
    affine_transform,
    fliplr_joints,
    get_affine_transform,
    get_affine_transform_np,
    get_dir,
    get_3rd_point,
    invert_affine,
    transform_preds,
)
from epipolarpose_tpu.geometry.camera import (  # noqa: F401
    Camera,
    camera_to_world_frame,
    normalized_camera_coords,
    pixel2cam,
    project_point_radial,
    undistort_points,
    world_to_camera_frame,
)
from epipolarpose_tpu.geometry.triangulation import (  # noqa: F401
    triangulate,
    triangulate_points,
)
from epipolarpose_tpu.geometry.procrustes import (  # noqa: F401
    compute_similarity_transform,
    procrustes_align,
)
from epipolarpose_tpu.geometry.epipolar import (  # noqa: F401
    decompose_essential,
    estimate_fundamental,
    recover_pose,
)
