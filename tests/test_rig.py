"""Extrinsics-free rig estimation: synthetic recovery tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from epipolarpose_tpu.config import config
from epipolarpose_tpu.data.synthetic import make_rig
from epipolarpose_tpu.geometry import project_point_radial
from epipolarpose_tpu.geometry.camera import Camera
from epipolarpose_tpu.geometry.rig import (
    estimate_rig, pseudo_gt_uncalibrated,
)


def _scene(rng, G=12, J=17, V=4):
    """Synthetic multiview scene with pinhole cameras (no distortion —
    the uncalibrated path assumes undistorted/ideal detections)."""
    cams = make_rig(V, seed=3)
    cams = [c.replace(k=np.zeros(3, np.float32),
                      p=np.zeros(2, np.float32)) for c in cams]
    poses = rng.uniform(-400, 400, (G, J, 3)).astype(np.float32)
    poses[..., 2] += 900.0
    det = np.zeros((G, V, J, 2), np.float32)
    for v, c in enumerate(cams):
        px, _ = project_point_radial(jnp.asarray(poses), c)
        det[:, v] = np.asarray(px)
    import jax
    cam_stack = jax.tree.map(lambda *x: jnp.stack(x), *cams)
    return poses, det, cams, cam_stack


def test_estimate_rig_recovers_rotations(rng):
    poses, det, cams, cam_stack = _scene(rng)
    from epipolarpose_tpu.geometry.camera import normalized_camera_coords
    G, V, J, _ = det.shape
    norm = np.zeros_like(det)
    for v, c in enumerate(cams):
        norm[:, v] = np.asarray(normalized_camera_coords(
            jnp.asarray(det[:, v]), c))
    P, _ = estimate_rig(jnp.asarray(norm))
    # relative rotation of view v wrt view 0 must match GT
    R0 = np.asarray(cams[0].R)
    for v in range(1, 4):
        R_gt = np.asarray(cams[v].R) @ R0.T
        R_est = np.asarray(P[v, :, :3])
        assert np.abs(R_est - R_gt).max() < 5e-2, \
            f"view {v}: {np.abs(R_est - R_gt).max()}"


def test_uncalibrated_pseudo_gt_up_to_scale(rng):
    poses, det, cams, cam_stack = _scene(rng)
    X, P, _ = pseudo_gt_uncalibrated(jnp.asarray(det), cam_stack)
    X = np.asarray(X)
    # GT in camera-0 frame
    from epipolarpose_tpu.geometry import world_to_camera_frame
    gt_cam0 = np.asarray(world_to_camera_frame(jnp.asarray(poses), cams[0]))
    # least-squares global scale alignment, then compare
    s = (X * gt_cam0).sum() / (X * X).sum()
    err = np.linalg.norm(s * X - gt_cam0, axis=-1)
    # scene scale is ~5000mm from the cameras; <1% relative error
    assert err.max() < 50.0, f"max {err.max()} mm (scale {s:.1f})"


def test_uncalibrated_bone_length_scale(rng):
    poses, det, cams, cam_stack = _scene(rng)
    # measure the true mean length of a few "bones"
    pairs = [(0, 1), (2, 3), (4, 5)]
    a = np.array([p[0] for p in pairs])
    b = np.array([p[1] for p in pairs])
    from epipolarpose_tpu.geometry import world_to_camera_frame
    gt_cam0 = np.asarray(world_to_camera_frame(jnp.asarray(poses), cams[0]))
    true_len = float(np.linalg.norm(
        gt_cam0[:, a] - gt_cam0[:, b], axis=-1).mean())
    X, _, _ = pseudo_gt_uncalibrated(jnp.asarray(det), cam_stack,
                                  bone_pairs=pairs,
                                  bone_length_mm=true_len)
    X = np.asarray(X)
    err = np.linalg.norm(X - gt_cam0, axis=-1)
    assert err.max() < 50.0, f"max {err.max()} mm"


def test_bone_scale_keeps_reprojection(rng):
    """Bone-length rescaling must scale points AND baselines together:
    reprojected pixels are scale-invariant, depths come out in mm."""
    poses, det, cams, cam_stack = _scene(rng)
    pairs = [(0, 1), (2, 3), (4, 5)]
    a = np.array([p[0] for p in pairs]); b = np.array([p[1] for p in pairs])
    from epipolarpose_tpu.geometry import world_to_camera_frame
    gt_cam0 = np.asarray(world_to_camera_frame(jnp.asarray(poses), cams[0]))
    true_len = float(np.linalg.norm(
        gt_cam0[:, a] - gt_cam0[:, b], axis=-1).mean())

    X1, P1, r1 = pseudo_gt_uncalibrated(jnp.asarray(det), cam_stack)
    X2, P2, r2 = pseudo_gt_uncalibrated(jnp.asarray(det), cam_stack,
                                    bone_pairs=pairs,
                                    bone_length_mm=true_len)

    def reproject(X, P):
        Xh = jnp.concatenate([X, jnp.ones_like(X[..., :1])], -1)
        Xc = jnp.einsum("vij,gnj->gvni", P, Xh)
        return np.asarray(Xc[..., :2] / Xc[..., 2:3]), np.asarray(Xc[..., 2])

    r1, z1 = reproject(X1, P1)
    r2, z2 = reproject(X2, P2)
    np.testing.assert_allclose(r1, r2, atol=1e-5)
    # scaled depths = s * unit-baseline depths, with s = |X2|/|X1|
    s = float(np.linalg.norm(np.asarray(X2)) / np.linalg.norm(np.asarray(X1)))
    np.testing.assert_allclose(z2, z1 * s, rtol=1e-5)
