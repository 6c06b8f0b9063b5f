"""On-device affine warp vs cv2.warpAffine (the reference's backend)."""

import cv2
import numpy as np
import pytest

from epipolarpose_tpu.geometry import get_affine_transform
from epipolarpose_tpu.ops import warp_affine


@pytest.mark.parametrize("rot", [0.0, 15.0, -40.0])
def test_matches_cv2_crop(rot, rng):
    img = rng.uniform(0, 255, (480, 640, 3)).astype(np.float32)
    # smooth the image so sub-pixel interpolation differences stay tiny
    img = cv2.GaussianBlur(img, (0, 0), 2.0)
    center = np.array([320.0, 240.0], np.float32)
    scale = np.array([1.1, 1.1], np.float32)
    M = np.asarray(get_affine_transform(center, scale, rot, (256, 256)))
    oracle = cv2.warpAffine(img, M, (256, 256), flags=cv2.INTER_LINEAR)
    ours = np.asarray(warp_affine(img[None], M, (256, 256)))[0]
    diff = np.abs(ours - oracle)
    # interior must match closely; borders can differ by interpolation edge
    assert np.median(diff) < 0.5
    assert (diff < 2.0).mean() > 0.97


def test_identity_warp(rng):
    img = rng.uniform(0, 1, (2, 32, 32, 1)).astype(np.float32)
    M = np.array([[1.0, 0, 0], [0, 1, 0]], np.float32)
    out = np.asarray(warp_affine(img, M, (32, 32)))
    np.testing.assert_allclose(out, img, atol=1e-5)


def test_translation_zero_border():
    img = np.ones((1, 8, 8, 1), np.float32)
    M = np.array([[1.0, 0, 4], [0, 1, 0]], np.float32)  # shift +4 in x
    out = np.asarray(warp_affine(img, M, (8, 8)))[0, :, :, 0]
    np.testing.assert_allclose(out[:, 4:], 1.0)
    np.testing.assert_allclose(out[:, :4], 0.0)


def test_batched_distinct_transforms(rng):
    img = rng.uniform(0, 1, (3, 64, 64, 2)).astype(np.float32)
    Ms = np.stack([
        np.array([[1.0, 0, 0], [0, 1, 0]], np.float32),
        np.array([[1.0, 0, 10], [0, 1, 0]], np.float32),
        np.array([[0.5, 0, 0], [0, 0.5, 0]], np.float32),
    ])
    out = np.asarray(warp_affine(img, Ms, (64, 64)))
    np.testing.assert_allclose(out[0], img[0], atol=1e-5)
    assert not np.allclose(out[1], img[1])


def test_separable_matches_gather(rng):
    from epipolarpose_tpu.ops.warp import warp_affine_separable
    img = rng.uniform(0, 1, (4, 120, 160, 3)).astype(np.float32)
    # rotation-free crop transforms
    centers = rng.uniform((40, 30), (120, 90), (4, 2)).astype(np.float32)
    scales = np.repeat(rng.uniform(0.3, 0.6, (4, 1)), 2, 1).astype(np.float32)
    M = np.asarray(get_affine_transform(centers, scales, 0.0, (64, 64)))
    a = np.asarray(warp_affine(img, M, (64, 64)))
    b = np.asarray(warp_affine_separable(img, M, (64, 64)))
    np.testing.assert_allclose(a, b, atol=1e-4)


def test_separable_matches_cv2(rng):
    from epipolarpose_tpu.ops.warp import warp_affine_separable
    img = rng.uniform(0, 255, (240, 320, 3)).astype(np.float32)
    img = cv2.GaussianBlur(img, (0, 0), 1.5)
    center = np.array([160.0, 120.0], np.float32)
    scale = np.array([0.8, 0.8], np.float32)
    M = np.asarray(get_affine_transform(center, scale, 0.0, (128, 128)))
    oracle = cv2.warpAffine(img, M, (128, 128), flags=cv2.INTER_LINEAR)
    ours = np.asarray(warp_affine_separable(img[None], M, (128, 128)))[0]
    diff = np.abs(ours - oracle)
    assert np.median(diff) < 0.5 and (diff < 2.0).mean() > 0.97
