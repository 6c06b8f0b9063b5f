"""Procrustes alignment (PA-MPJPE protocol) tests."""

import numpy as np

from epipolarpose_tpu.geometry import compute_similarity_transform, \
    procrustes_align


def _random_rotation(rng):
    import cv2
    R, _ = cv2.Rodrigues(rng.standard_normal(3))
    return R.astype(np.float32)


def test_exact_alignment(rng):
    X = rng.standard_normal((17, 3)).astype(np.float32)
    R = _random_rotation(rng)
    s = 1.7
    t = rng.standard_normal(3).astype(np.float32)
    Y = s * X @ R.T + t
    aligned = np.asarray(procrustes_align(X, Y))
    np.testing.assert_allclose(aligned, Y, atol=1e-3)


def test_recovers_parameters(rng):
    X = rng.standard_normal((17, 3)).astype(np.float32)
    R_gt = _random_rotation(rng)
    Y = 2.0 * X @ R_gt.T + np.array([1, 2, 3], np.float32)
    s, R, t = compute_similarity_transform(X, Y)
    np.testing.assert_allclose(float(s), 2.0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(R), R_gt.T, atol=1e-3)


def test_reflection_not_allowed(rng):
    X = rng.standard_normal((17, 3)).astype(np.float32)
    Y = X.copy()
    Y[:, 0] *= -1  # mirror
    s, R, t = compute_similarity_transform(X, Y)
    assert np.linalg.det(np.asarray(R)) > 0  # proper rotation enforced


def test_batched(rng):
    X = rng.standard_normal((8, 17, 3)).astype(np.float32)
    R = _random_rotation(rng)
    Y = 1.3 * X @ R.T + 0.5
    aligned = np.asarray(procrustes_align(X, Y))
    np.testing.assert_allclose(aligned, Y, atol=1e-3)


def test_matches_scipy_orthogonal_procrustes(rng):
    """Cross-check the rotation against scipy on centered, scale-free data."""
    from scipy.linalg import orthogonal_procrustes
    X = rng.standard_normal((17, 3)).astype(np.float64)
    R_gt = _random_rotation(rng).astype(np.float64)
    Y = X @ R_gt.T
    Rs, _ = orthogonal_procrustes(X, Y)
    s, R, t = compute_similarity_transform(X.astype(np.float32),
                                           Y.astype(np.float32))
    np.testing.assert_allclose(np.asarray(R), Rs, atol=1e-3)
