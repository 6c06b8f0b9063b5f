"""Epipolar estimation: F/E recovery on synthetic two-view rigs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from epipolarpose_tpu.geometry import (
    decompose_essential, estimate_fundamental, recover_pose,
)
from epipolarpose_tpu.geometry.epipolar import (
    estimate_essential, ransac_fundamental, sampson_distance,
)


def two_view_scene(rng, n=40, noise=0.0):
    """Random relative pose + 3D points; returns normalized-coords matches."""
    import cv2
    rvec = rng.standard_normal(3) * 0.4
    R, _ = cv2.Rodrigues(rvec)
    t = rng.standard_normal(3)
    t /= np.linalg.norm(t)
    X = rng.uniform(-1, 1, (n, 3)) + np.array([0, 0, 5.0])
    x1 = X[:, :2] / X[:, 2:3]
    X2 = X @ R.T + t
    x2 = X2[:, :2] / X2[:, 2:3]
    if noise:
        x1 = x1 + rng.normal(0, noise, x1.shape)
        x2 = x2 + rng.normal(0, noise, x2.shape)
    return (x1.astype(np.float32), x2.astype(np.float32),
            R.astype(np.float32), t.astype(np.float32))


def test_fundamental_epipolar_constraint(rng):
    x1, x2, _, _ = two_view_scene(rng)
    F = estimate_fundamental(jnp.asarray(x1), jnp.asarray(x2))
    d = sampson_distance(F, jnp.asarray(x1), jnp.asarray(x2))
    assert np.asarray(d).max() < 1e-8
    # rank 2
    s = np.linalg.svd(np.asarray(F), compute_uv=False)
    assert s[2] < 1e-6


def test_fundamental_matches_cv2(rng):
    import cv2
    x1, x2, _, _ = two_view_scene(rng, noise=1e-4)
    F_ours = np.asarray(estimate_fundamental(jnp.asarray(x1),
                                             jnp.asarray(x2)))
    F_cv, _ = cv2.findFundamentalMat(x1, x2, cv2.FM_8POINT)
    F_cv /= np.linalg.norm(F_cv)
    # up to sign
    err = min(np.abs(F_ours - F_cv).max(), np.abs(F_ours + F_cv).max())
    assert err < 5e-3


def test_recover_pose(rng):
    x1, x2, R_gt, t_gt = two_view_scene(rng)
    E = estimate_essential(jnp.asarray(x1), jnp.asarray(x2))
    R, t, n_good = recover_pose(E, jnp.asarray(x1), jnp.asarray(x2))
    assert int(n_good) == x1.shape[0]
    np.testing.assert_allclose(np.asarray(R), R_gt, atol=1e-2)
    # translation up to scale (already unit) and fixed sign by cheirality
    t_est = np.asarray(t)
    err = min(np.linalg.norm(t_est - t_gt), np.linalg.norm(t_est + t_gt))
    assert err < 1e-2
    # cheirality must fix the sign too
    np.testing.assert_allclose(t_est, t_gt, atol=1e-2)


def test_decompose_essential_rotations_proper(rng):
    x1, x2, _, _ = two_view_scene(rng)
    E = estimate_essential(jnp.asarray(x1), jnp.asarray(x2))
    R1, R2, t = decompose_essential(E)
    assert abs(np.linalg.det(np.asarray(R1)) - 1) < 1e-4
    assert abs(np.linalg.det(np.asarray(R2)) - 1) < 1e-4
    np.testing.assert_allclose(np.linalg.norm(np.asarray(t)), 1.0, atol=1e-4)


def test_ransac_rejects_outliers(rng):
    x1, x2, R_gt, t_gt = two_view_scene(rng, n=60, noise=1e-4)
    # corrupt 20% of matches
    n_out = 12
    x2c = x2.copy()
    x2c[:n_out] += rng.uniform(0.3, 0.6, (n_out, 2)).astype(np.float32)
    key = jax.random.PRNGKey(0)
    F, inliers = ransac_fundamental(key, jnp.asarray(x1), jnp.asarray(x2c),
                                    num_hypotheses=128, inlier_thresh=1e-5)
    inl = np.asarray(inliers)
    assert inl[n_out:].mean() > 0.95      # keeps the good matches
    assert inl[:n_out].mean() < 0.2       # drops the corrupted ones


def test_batched_fundamental(rng):
    xs1, xs2 = [], []
    for _ in range(5):
        x1, x2, _, _ = two_view_scene(rng)
        xs1.append(x1); xs2.append(x2)
    F = estimate_fundamental(jnp.asarray(np.stack(xs1)),
                             jnp.asarray(np.stack(xs2)))
    assert F.shape == (5, 3, 3)
    d = sampson_distance(F, jnp.asarray(np.stack(xs1)),
                         jnp.asarray(np.stack(xs2)))
    assert np.asarray(d).max() < 1e-7
