"""Camera model tests: projection fixtures, distortion inversion, frames."""

import jax.numpy as jnp
import numpy as np

from epipolarpose_tpu.geometry import (
    Camera, camera_to_world_frame, project_point_radial, undistort_points,
    world_to_camera_frame,
)


def _random_camera(rng, with_distortion=True):
    import cv2
    rvec = rng.standard_normal(3) * 0.3
    R, _ = cv2.Rodrigues(rvec)
    return Camera(
        R=np.asarray(R, np.float32),
        T=rng.uniform(-2, 2, 3).astype(np.float32) + np.array([0, 0, -6],
                                                              np.float32),
        f=np.array([1100.0, 1100.0], np.float32),
        c=np.array([512.0, 510.0], np.float32),
        k=(np.array([-0.2, 0.2, -0.002], np.float32) if with_distortion
           else np.zeros(3, np.float32)),
        p=(np.array([0.001, -0.0005], np.float32) if with_distortion
           else np.zeros(2, np.float32)),
    )


def test_world_camera_roundtrip(rng):
    cam = _random_camera(rng)
    P = rng.uniform(-1, 1, (10, 3)).astype(np.float32)
    X = world_to_camera_frame(P, cam)
    back = camera_to_world_frame(X, cam)
    np.testing.assert_allclose(np.asarray(back), P, atol=1e-4)


def test_pinhole_projection_closed_form():
    # camera at origin looking down +z, no rotation/distortion
    cam = Camera.identity()
    cam = cam.replace(f=np.array([100.0, 100.0], np.float32),
                      c=np.array([50.0, 60.0], np.float32))
    P = np.array([[1.0, 2.0, 10.0]], np.float32)
    px, d = project_point_radial(P, cam)
    np.testing.assert_allclose(np.asarray(px)[0], [100 * 0.1 + 50,
                                                   100 * 0.2 + 60], atol=1e-4)
    np.testing.assert_allclose(np.asarray(d)[0], 10.0, atol=1e-5)


def test_projection_matches_h36m_formula_f64(rng):
    """Full model vs an independent float64 implementation of the H36M
    (una-dinosauria ``project_point_radial``) formula — NOTE: this tangential
    model differs from OpenCV's; the reference uses the H36M one."""
    cam = _random_camera(rng)
    P = rng.uniform(-1, 1, (20, 3)).astype(np.float64)
    px, _ = project_point_radial(P.astype(np.float32), cam)

    R = np.asarray(cam.R, np.float64)
    T = np.asarray(cam.T, np.float64)
    f = np.asarray(cam.f, np.float64)
    c = np.asarray(cam.c, np.float64)
    k = np.asarray(cam.k, np.float64)
    p = np.asarray(cam.p, np.float64)
    X = (R @ (P - T).T).T
    XX = X[:, :2] / X[:, 2:3]
    r2 = (XX ** 2).sum(1)
    radial = 1 + k[0] * r2 + k[1] * r2 ** 2 + k[2] * r2 ** 3
    tan = p[0] * XX[:, 1] + p[1] * XX[:, 0]
    XXX = XX * (radial + tan)[:, None] + np.outer(r2, np.array([p[1], p[0]]))
    expected = f * XXX + c
    np.testing.assert_allclose(np.asarray(px), expected, atol=0.05)


def test_radial_only_matches_cv2(rng):
    """With zero tangential distortion the model coincides with OpenCV's."""
    import cv2
    cam = _random_camera(rng)
    cam = cam.replace(p=np.zeros(2, np.float32))
    P = rng.uniform(-1, 1, (20, 3)).astype(np.float64)
    px, _ = project_point_radial(P.astype(np.float32), cam)
    rvec, _ = cv2.Rodrigues(np.asarray(cam.R, np.float64))
    tvec = -np.asarray(cam.R, np.float64) @ np.asarray(cam.T, np.float64)
    K = np.array([[cam.f[0], 0, cam.c[0]], [0, cam.f[1], cam.c[1]],
                  [0, 0, 1]], np.float64)
    dist = np.array([cam.k[0], cam.k[1], 0.0, 0.0, cam.k[2]], np.float64)
    expected, _ = cv2.projectPoints(P, rvec, tvec, K, dist)
    np.testing.assert_allclose(np.asarray(px), expected[:, 0, :], atol=0.1)


def test_undistort_inverts_distortion(rng):
    cam = _random_camera(rng)
    # ideal pinhole pixels of random world points
    pinhole = cam.replace(k=np.zeros(3, np.float32),
                          p=np.zeros(2, np.float32))
    P = rng.uniform(-1, 1, (50, 3)).astype(np.float32)
    ideal_px, _ = project_point_radial(P, pinhole)
    distorted_px, _ = project_point_radial(P, cam)
    recovered = undistort_points(distorted_px, cam, iters=8)
    np.testing.assert_allclose(np.asarray(recovered), np.asarray(ideal_px),
                               atol=0.05)


def test_projection_matrix_pinhole_consistency(rng):
    cam = _random_camera(rng, with_distortion=False)
    P3 = rng.uniform(-1, 1, (10, 3)).astype(np.float32)
    px, _ = project_point_radial(P3, cam)
    Ph = np.concatenate([P3, np.ones((10, 1), np.float32)], axis=1)
    proj = (np.asarray(cam.P) @ Ph.T).T
    proj = proj[:, :2] / proj[:, 2:3]
    np.testing.assert_allclose(np.asarray(px), proj, atol=1e-2)


def test_batched_cameras(rng):
    cams = Camera.identity((4,))
    P = rng.uniform(-1, 1, (4, 7, 3)).astype(np.float32) + np.array(
        [0, 0, 5], np.float32)
    px, d = project_point_radial(P, cams)
    assert np.asarray(px).shape == (4, 7, 2)
    assert np.asarray(d).shape == (4, 7)


def test_pixel2cam_inverts_projection(rng):
    """undistort + pixel2cam must invert project_point_radial given the
    true depths (the integral-pose H36M eval protocol)."""
    from epipolarpose_tpu.geometry import (pixel2cam, undistort_points,
                                           world_to_camera_frame)
    cam = _random_camera(rng)
    pts_w = jnp.asarray(rng.uniform(-400, 400, (1, 10, 3)), jnp.float32)
    pts_w = pts_w + jnp.asarray([0.0, 0.0, 4000.0])
    px, depth = project_point_radial(pts_w, cam)
    ideal = undistort_points(px, cam)
    back = pixel2cam(ideal, depth, cam)
    gt_cam = world_to_camera_frame(pts_w, cam)
    np.testing.assert_allclose(np.asarray(back), np.asarray(gt_cam),
                               atol=0.5)
