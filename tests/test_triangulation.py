"""DLT triangulation: exact recovery on synthetic rigs, all three backends.

SURVEY.md §7: "DLT on synthetic cameras with known 3D points — exact recovery
to ~1e-4" and f32-vs-f64 validation for the fast path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from epipolarpose_tpu.geometry import Camera, project_point_radial, triangulate
from epipolarpose_tpu.geometry.triangulation import (
    reprojection_error, triangulate_points,
)


def make_rig(rng, num_views=4, radius=5.0):
    """Synthetic H36M-like rig: cameras on a circle looking at the origin."""
    import cv2
    cams = []
    for v in range(num_views):
        ang = 2 * np.pi * v / num_views + rng.uniform(-0.1, 0.1)
        T = np.array([radius * np.cos(ang), radius * np.sin(ang),
                      rng.uniform(1.4, 1.8)], np.float32)
        # rotation looking at origin
        z = -T / np.linalg.norm(T)
        up = np.array([0, 0, 1.0], np.float32)
        x = np.cross(up, z); x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z]).astype(np.float32)
        cams.append(Camera(R=R, T=T,
                           f=np.array([1145.0, 1143.0], np.float32),
                           c=np.array([512.5, 515.4], np.float32),
                           k=np.zeros(3, np.float32),
                           p=np.zeros(2, np.float32)))
    return jax.tree.map(lambda *x: jnp.stack(x), *cams)


@pytest.mark.parametrize("method", ["svd", "eigh", "fast"])
def test_exact_recovery(method, rng):
    cams = make_rig(rng)
    N, J = 8, 17
    X_gt = rng.uniform(-1, 1, (N, J, 3)).astype(np.float32)
    # project with each camera: points2d (N, V, J, 2)
    px, _ = project_point_radial(X_gt[:, None], cams)   # (N, V, J, 2)
    P = cams.P                                          # (V, 3, 4)
    X, res = triangulate(px, P, method=method)
    err = np.linalg.norm(np.asarray(X) - X_gt, axis=-1)
    assert err.max() < 2e-3, f"{method}: max err {err.max()}"
    assert np.asarray(res).max() < 1e-3


@pytest.mark.parametrize("method", ["eigh", "fast"])
def test_matches_f64_svd(method, rng):
    """f32 on-device result vs float64 host SVD oracle (SURVEY §7)."""
    cams = make_rig(rng)
    N, J = 4, 17
    X_gt = rng.uniform(-1, 1, (N, J, 3)).astype(np.float32)
    px, _ = project_point_radial(X_gt[:, None], cams)
    pxn = np.asarray(px) + rng.normal(0, 2.0, px.shape)  # noisy detections
    P = np.asarray(cams.P, np.float64)

    # float64 oracle
    oracle = np.zeros((N, J, 3))
    for n in range(N):
        for j in range(J):
            rows = []
            for v in range(4):
                x, y = pxn[n, v, j]
                rows.append(x * P[v, 2] - P[v, 0])
                rows.append(y * P[v, 2] - P[v, 1])
            A = np.stack(rows)
            A = A / np.linalg.norm(A, axis=1, keepdims=True)
            _, _, vt = np.linalg.svd(A)
            h = vt[-1]
            oracle[n, j] = h[:3] / h[3]

    X, _ = triangulate(jnp.asarray(pxn, jnp.float32),
                       jnp.asarray(P, jnp.float32), method=method)
    err = np.linalg.norm(np.asarray(X) - oracle, axis=-1)
    assert err.max() < 5e-3, f"{method} vs f64: max {err.max()}"


def test_confidence_weights_downweight_bad_view(rng):
    cams = make_rig(rng)
    N, J = 4, 17
    X_gt = rng.uniform(-1, 1, (N, J, 3)).astype(np.float32)
    px, _ = project_point_radial(X_gt[:, None], cams)
    px = np.asarray(px).copy()
    px[:, 0] += 300.0  # corrupt view 0 badly
    w = np.ones((N, 4, J), np.float32)
    w[:, 0] = 1e-4
    X, _ = triangulate(jnp.asarray(px), cams.P, weights=jnp.asarray(w),
                       method="fast")
    err = np.linalg.norm(np.asarray(X) - X_gt, axis=-1)
    assert err.max() < 5e-3
    # without weights it should be much worse
    X_bad, _ = triangulate(jnp.asarray(px), cams.P, method="fast")
    err_bad = np.linalg.norm(np.asarray(X_bad) - X_gt, axis=-1)
    assert err_bad.mean() > 10 * err.mean()


def test_two_view_minimum(rng):
    cams = make_rig(rng, num_views=2)
    X_gt = rng.uniform(-1, 1, (3, 17, 3)).astype(np.float32)
    px, _ = project_point_radial(X_gt[:, None], cams)
    X, _ = triangulate(px, cams.P, method="fast")
    err = np.linalg.norm(np.asarray(X) - X_gt, axis=-1)
    assert err.max() < 5e-3


def test_reprojection_error_zero_on_exact(rng):
    cams = make_rig(rng)
    X_gt = rng.uniform(-1, 1, (2, 5, 3)).astype(np.float32)
    px, _ = project_point_radial(X_gt[:, None], cams)
    pts = jnp.swapaxes(px, 1, 2)                        # (N, J, V, 2)
    e = reprojection_error(jnp.asarray(X_gt), pts, cams.P[None, None])
    assert np.asarray(e).max() < 0.1


def test_jit_and_vmap_compatible(rng):
    cams = make_rig(rng)
    X_gt = rng.uniform(-1, 1, (2, 17, 3)).astype(np.float32)
    px, _ = project_point_radial(X_gt[:, None], cams)
    f = jax.jit(lambda p: triangulate(p, cams.P, method="fast")[0])
    X = f(px)
    err = np.linalg.norm(np.asarray(X) - X_gt, axis=-1)
    assert err.max() < 5e-3
