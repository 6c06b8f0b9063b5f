"""Rig self-calibration: recover camera extrinsics from 2D correspondences.

The reference's calibration-free mode (paper §3.2, arXiv:1903.02330 —
SURVEY.md §3.2 [M]): when extrinsics are withheld, estimate the essential
matrix between camera pairs from the teacher's 2D joint detections, recover
relative (R, t) up to scale, and triangulate pseudo-GT in the reference
camera's frame. Scale is fixed either to a unit baseline or by a known mean
skeleton bone length.

All batched jnp; camera 0 is the reference frame (P_0 = [I | 0]).
"""

from __future__ import annotations

import jax.numpy as jnp

from epipolarpose_tpu.geometry.camera import Camera, normalized_camera_coords
from epipolarpose_tpu.geometry.epipolar import (
    estimate_essential, recover_pose,
)
from epipolarpose_tpu.geometry.triangulation import triangulate


def estimate_rig(detections_norm, conf=None):
    """Recover per-view [R | t] from multi-view 2D correspondences.

    detections_norm: (G, V, J, 2) NORMALIZED (K⁻¹) image coords of the same
    G·J points seen from V views. View 0 is the reference. Returns
    P (V, 3, 4) with P[0] = [I | 0] and a consistent global scale: the
    (0,1) baseline has unit length, and every other view's translation is
    scaled so its two-view triangulations agree with pair (0, 1).
    """
    G, V, J, _ = detections_norm.shape
    x0 = detections_norm[:, 0].reshape(G * J, 2)

    eye34 = jnp.concatenate([jnp.eye(3, dtype=jnp.float32),
                             jnp.zeros((3, 1), jnp.float32)], axis=1)
    Ps = [eye34]
    X_ref = None
    for v in range(1, V):
        xv = detections_norm[:, v].reshape(G * J, 2)
        wv = None
        if conf is not None:
            wv = (conf[:, 0].reshape(-1) * conf[:, v].reshape(-1))
        E = estimate_essential(x0, xv, weights=wv)
        R, t, _ = recover_pose(E, x0, xv)
        P_v = jnp.concatenate([R, t[:, None]], axis=1)
        # two-view triangulation against the reference camera:
        # points (N, V=2, J=1, 2) with shared P_pair (2, 3, 4)
        pts = jnp.stack([x0, xv], axis=1)[:, :, None, :]
        P_pair = jnp.stack([eye34, P_v])
        X_v, _ = triangulate(pts, P_pair)
        X_v = X_v[:, 0]
        if X_ref is None:
            X_ref = X_v
            Ps.append(P_v)
        else:
            # scale translation so this pair's points match pair (0,1)'s:
            # a unit baseline yields scene/B_v, so matching the reference
            # scene/B_1 needs the baseline scaled by s = B_v/B_1, which is
            # exactly the least-squares point-set ratio below
            num = jnp.sum(X_v * X_ref)
            den = jnp.sum(X_v * X_v) + 1e-12
            s = num / den
            Ps.append(jnp.concatenate([R, (t * s)[:, None]], axis=1))
    return jnp.stack(Ps), X_ref


def pseudo_gt_uncalibrated(detections_px, intrinsics: Camera, conf=None,
                           method: str = "fast",
                           bone_pairs=None, bone_length_mm=None):
    """Full extrinsics-free pseudo-GT: pixels -> rig -> triangulation.

    detections_px: (G, V, J, 2) pixel detections; intrinsics: Camera pytree
    with (V,)-leading fields (only f/c used — extrinsics are estimated).
    Returns (X (G, J, 3) in camera-0 frame, P (V, 3, 4),
    residual (G, J) — the DLT residual, in the same scale as X).

    Scale: unit (0,1)-baseline by default; if ``bone_pairs`` (list of joint
    index pairs) and ``bone_length_mm`` are given, rescale so the mean bone
    length matches (paper's known-skeleton-size resolution of the scale
    ambiguity [M]).
    """
    G, V, J, _ = detections_px.shape
    det_v = detections_px.swapaxes(0, 1).reshape(V, G * J, 2)
    norm = normalized_camera_coords(det_v, intrinsics)
    norm = norm.reshape(V, G, J, 2).swapaxes(0, 1)
    P, _ = estimate_rig(norm, conf)
    X, res = triangulate(norm, P, weights=conf, method=method)
    if bone_pairs is not None and bone_length_mm is not None:
        a = jnp.asarray([p[0] for p in bone_pairs])
        b = jnp.asarray([p[1] for p in bone_pairs])
        lengths = jnp.linalg.norm(X[:, a] - X[:, b], axis=-1)
        s = bone_length_mm / (lengths.mean() + 1e-12)
        # rescale the WHOLE reconstruction: points AND baselines. Scaling X
        # alone would break reprojection (R X s + t != s (R X + t)); the
        # translation column must carry the same factor so per-view
        # projections — and per-view depths — stay consistent in mm.
        X = X * s
        P = P.at[:, :, 3].multiply(s)
        res = res * s
    return X, P, res
