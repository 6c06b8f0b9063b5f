"""Affine transform parity vs cv2 (the reference's backend)."""

import cv2
import numpy as np
import pytest

from epipolarpose_tpu.geometry import (
    affine_transform, fliplr_joints, get_affine_transform, invert_affine,
    transform_preds,
)
from epipolarpose_tpu.geometry.affine import flip_back


def _cv2_reference_transform(center, scale, rot, output_size, inv=0):
    """The reference's get_affine_transform re-derived with cv2 (oracle)."""
    def get_dir(pt, rad):
        sn, cs = np.sin(rad), np.cos(rad)
        return np.array([pt[0] * cs - pt[1] * sn, pt[0] * sn + pt[1] * cs])

    def third(a, b):
        d = a - b
        return b + np.array([-d[1], d[0]])

    scale_tmp = np.array(scale) * 200.0
    src_w = scale_tmp[0]
    dst_w, dst_h = output_size
    rad = np.pi * rot / 180
    src_dir = get_dir([0, src_w * -0.5], rad)
    dst_dir = np.array([0, dst_w * -0.5])
    src = np.zeros((3, 2), np.float32)
    dst = np.zeros((3, 2), np.float32)
    src[0] = center
    src[1] = np.array(center) + src_dir
    src[2] = third(src[0], src[1])
    dst[0] = [dst_w * 0.5, dst_h * 0.5]
    dst[1] = dst[0] + dst_dir
    dst[2] = third(dst[0], dst[1])
    if inv:
        return cv2.getAffineTransform(dst, src)
    return cv2.getAffineTransform(src, dst)


@pytest.mark.parametrize("rot", [0.0, 17.5, -30.0, 90.0])
@pytest.mark.parametrize("inv", [0, 1])
def test_matches_cv2_construction(rot, inv, rng):
    center = rng.uniform(50, 400, 2)
    scale = rng.uniform(0.8, 2.0, 2)
    scale[1] = scale[0]  # reference uses isotropic scale boxes
    ours = np.asarray(get_affine_transform(center, scale, rot, (256, 256),
                                           inv=bool(inv)))
    oracle = _cv2_reference_transform(center, scale, rot, (256, 256), inv)
    np.testing.assert_allclose(ours, oracle, atol=1e-3)


def test_batched_construction(rng):
    centers = rng.uniform(50, 400, (16, 2)).astype(np.float32)
    scales = np.repeat(rng.uniform(0.8, 2.0, (16, 1)), 2, 1).astype(np.float32)
    rots = rng.uniform(-30, 30, 16).astype(np.float32)
    Ms = np.asarray(get_affine_transform(centers, scales, rots, (256, 256)))
    assert Ms.shape == (16, 2, 3)
    for i in range(16):
        oracle = _cv2_reference_transform(centers[i], scales[i], rots[i],
                                          (256, 256))
        np.testing.assert_allclose(Ms[i], oracle, atol=1e-3)


def test_affine_roundtrip(rng):
    center = np.array([200.0, 150.0])
    scale = np.array([1.2, 1.2])
    M = get_affine_transform(center, scale, 25.0, (256, 256))
    Minv = invert_affine(M)
    pts = rng.uniform(0, 400, (10, 2)).astype(np.float32)
    out = affine_transform(pts, M)
    back = affine_transform(out, Minv)
    np.testing.assert_allclose(np.asarray(back), pts, atol=1e-2)
    # inv=True construction equals matrix inverse
    M2 = get_affine_transform(center, scale, 25.0, (256, 256), inv=True)
    np.testing.assert_allclose(np.asarray(M2), np.asarray(Minv), atol=1e-3)


def test_transform_preds_maps_heatmap_to_image():
    center = np.array([100.0, 120.0])
    scale = np.array([1.0, 1.0])
    # center of a 64x64 heatmap must map back to the person center
    coords = np.array([[32.0, 32.0]])
    out = np.asarray(transform_preds(coords, center, scale, (64, 64)))
    np.testing.assert_allclose(out[0], center, atol=0.75)


def test_fliplr_joints():
    joints = np.array([[10.0, 5.0, 0.0], [20.0, 6.0, 0.0]], np.float32)
    vis = np.ones((2, 3), np.float32)
    vis[1] = 0.0                       # joint 1 invisible
    fj, fv = fliplr_joints(joints, vis, width=100, matched_parts=[(0, 1)])
    fj = np.asarray(fj)
    # joints swapped AND x mirrored: new joint0 = old joint1 mirrored,
    # which is INVISIBLE -> reference zeroes its coords (joints*joints_vis)
    np.testing.assert_allclose(fj[0], [0.0, 0.0, 0.0])
    np.testing.assert_allclose(fj[1], [100 - 1 - 10.0, 5.0, 0.0])
    np.testing.assert_allclose(np.asarray(fv)[0], 0.0)


def test_flip_back_inverts_flip(rng):
    hm = rng.standard_normal((2, 8, 8, 4)).astype(np.float32)
    pairs = [(0, 1), (2, 3)]
    flipped_input_maps = np.asarray(flip_back(hm, pairs))
    twice = np.asarray(flip_back(flipped_input_maps, pairs))
    np.testing.assert_allclose(twice, hm, atol=1e-6)


def test_numpy_affine_matches_jnp(rng):
    """Host-pipeline numpy twin must match the jnp affine exactly."""
    from epipolarpose_tpu.geometry.affine import (get_affine_transform,
                                                  get_affine_transform_np)
    c = rng.uniform(50, 400, (16, 2)).astype(np.float32)
    s = rng.uniform(0.5, 3.0, (16, 2)).astype(np.float32)
    r = rng.uniform(-45, 45, 16).astype(np.float32)
    for inv in (False, True):
        Mj = np.asarray(get_affine_transform(c, s, r, (256, 192), inv=inv))
        Mn = get_affine_transform_np(c, s, r, (256, 192), inv=inv)
        np.testing.assert_allclose(Mn, Mj, atol=1e-3)
