"""Epipolar geometry: batched 8-point F/E estimation + pose recovery.

The reference's calibration-free path (paper §3.2 of arXiv:1903.02330,
SURVEY.md §3.2 [M]) estimates the fundamental/essential matrix from 2D joint
correspondences (RANSAC) and decomposes it into relative camera pose (up to
scale) when extrinsics are withheld. The reference does this on host with
OpenCV; here everything is batched jnp so it jits into the self-supervised
pipeline — including RANSAC, which is vectorized over a static number of
hypotheses instead of a data-dependent loop (XLA-friendly control flow).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from functools import partial

# Geometry is numerically sensitive and computationally tiny: never let
# XLA drop these contractions to bf16 on the MXU (accuracy collapses from
# ~1e-6 to ~1e-2 at pixel scales).
_einsum = partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)



def _hartley_normalize(x):
    """Similarity-normalize points to centroid 0 / RMS distance sqrt(2).

    x: (..., N, 2). Returns (x_norm, T (..., 3, 3)) with x_h_norm = T @ x_h.
    """
    mu = x.mean(axis=-2, keepdims=True)
    d = jnp.linalg.norm(x - mu, axis=-1).mean(axis=-1)
    s = jnp.sqrt(2.0) / jnp.where(d < 1e-12, 1e-12, d)
    z = jnp.zeros_like(s)
    o = jnp.ones_like(s)
    T = jnp.stack([
        jnp.stack([s, z, -s * mu[..., 0, 0]], axis=-1),
        jnp.stack([z, s, -s * mu[..., 0, 1]], axis=-1),
        jnp.stack([z, z, o], axis=-1),
    ], axis=-2)
    return (x - mu) * s[..., None, None], T


def _nine_point_nullvec(A):
    """Smallest right-singular vector of (..., N, 9) via eigh of AᵀA."""
    M = _einsum("...ki,...kj->...ij", A, A)
    _, vecs = jnp.linalg.eigh(M)
    return vecs[..., :, 0]


def estimate_fundamental(x1, x2, weights=None):
    """Normalized 8-point fundamental matrix, batched.

    x1, x2: (..., N, 2) correspondences (x2ᵀ F x1 = 0); weights: (..., N).
    Returns F (..., 3, 3), rank-2-enforced, denormalized, f33-normalized.
    """
    x1n, T1 = _hartley_normalize(x1)
    x2n, T2 = _hartley_normalize(x2)
    u1, v1 = x1n[..., 0], x1n[..., 1]
    u2, v2 = x2n[..., 0], x2n[..., 1]
    ones = jnp.ones_like(u1)
    A = jnp.stack([u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, ones],
                  axis=-1)                               # (..., N, 9)
    if weights is not None:
        A = A * weights[..., None]
    f = _nine_point_nullvec(A)
    F = f.reshape(f.shape[:-1] + (3, 3))
    # rank-2 enforcement
    U, S, Vt = jnp.linalg.svd(F)
    S = S.at[..., 2].set(0.0)
    F = _einsum("...ij,...j,...jk->...ik", U, S, Vt)
    # denormalize: x2ᵀ F x1 with x = T x_orig  =>  F_orig = T2ᵀ F T1
    F = _einsum("...ji,...jk,...kl->...il", T2, F, T1)
    norm = jnp.linalg.norm(F.reshape(F.shape[:-2] + (9,)), axis=-1)
    return F / (norm[..., None, None] + 1e-30)


def _project_to_essential(E):
    """Nearest essential matrix: equalize σ1, σ2, zero σ3."""
    U, S, Vt = jnp.linalg.svd(E)
    s = (S[..., 0] + S[..., 1]) / 2.0
    Snew = jnp.stack([s, s, jnp.zeros_like(s)], axis=-1)
    return _einsum("...ij,...j,...jk->...ik", U, Snew, Vt)


def essential_from_fundamental(F, K1, K2):
    """E = K2ᵀ F K1, projected to the essential manifold (σ = 1,1,0)."""
    return _project_to_essential(
        _einsum("...ji,...jk,...kl->...il", K2, F, K1))


def estimate_essential(x1n, x2n, weights=None):
    """8-point on already-normalized (K⁻¹) coords, projected to E manifold."""
    return _project_to_essential(estimate_fundamental(x1n, x2n, weights))


_W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]],
               dtype=jnp.float32)


def decompose_essential(E):
    """E -> (R1, R2, t) candidate decompositions (cv2.decomposeEssentialMat).

    Returns rotations with det=+1 and unit-norm translation (up to sign).
    """
    U, _, Vt = jnp.linalg.svd(E)
    # enforce proper rotations
    U = U * jnp.sign(jnp.linalg.det(U))[..., None, None]
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))[..., None, None]
    R1 = _einsum("...ij,jk,...kl->...il", U, _W, Vt)
    R2 = _einsum("...ij,jk,...kl->...il", U, _W.T, Vt)
    t = U[..., :, 2]
    return R1, R2, t


def _triangulate_two_view(x1, x2, R, t):
    """Mid-point-free two-view DLT with P1=[I|0], P2=[R|t].

    x1, x2: (..., N, 2) normalized coords. Returns X in cam-1 frame and the
    depth in both cameras.
    """
    from epipolarpose_tpu.geometry.triangulation import triangulate_points
    eye = jnp.broadcast_to(
        jnp.concatenate([jnp.eye(3, dtype=x1.dtype),
                         jnp.zeros((3, 1), x1.dtype)], axis=-1),
        R.shape[:-2] + (3, 4))
    P2 = jnp.concatenate([R, t[..., None]], axis=-1)
    P = jnp.stack([eye, P2], axis=-3)                    # (..., 2, 3, 4)
    pts = jnp.stack([x1, x2], axis=-2)                   # (..., N, 2views, 2)
    X, _ = triangulate_points(pts, P[..., None, :, :, :], method="eigh")
    z1 = X[..., 2]
    z2 = _einsum("...ij,...nj->...ni", R, X)[..., 2] + t[..., None, 2]
    return X, z1, z2


def recover_pose(E, x1n, x2n):
    """Pick the (R, t) with maximal cheirality support (cv2.recoverPose-like).

    x1n/x2n: (..., N, 2) normalized coords. Returns (R, t, n_good).
    """
    R1, R2, t = decompose_essential(E)
    candidates = [(R1, t), (R1, -t), (R2, t), (R2, -t)]
    scores, Xs = [], []
    for R_c, t_c in candidates:
        _, z1, z2 = _triangulate_two_view(x1n, x2n, R_c, t_c)
        scores.append(jnp.sum((z1 > 0) & (z2 > 0), axis=-1))
    score = jnp.stack(scores, axis=-1)                   # (..., 4)
    best = jnp.argmax(score, axis=-1)
    Rs = jnp.stack([R1, R1, R2, R2], axis=-3)
    ts = jnp.stack([t, -t, t, -t], axis=-2)
    R = jnp.take_along_axis(Rs, best[..., None, None, None].repeat(3, -2)
                            .repeat(3, -1), axis=-3)[..., 0, :, :]
    tt = jnp.take_along_axis(ts, best[..., None, None].repeat(3, -1),
                             axis=-2)[..., 0, :]
    n_good = jnp.take_along_axis(score, best[..., None], axis=-1)[..., 0]
    return R, tt, n_good


def sampson_distance(F, x1, x2):
    """First-order epipolar distance per correspondence (..., N)."""
    x1h = jnp.concatenate([x1, jnp.ones_like(x1[..., :1])], axis=-1)
    x2h = jnp.concatenate([x2, jnp.ones_like(x2[..., :1])], axis=-1)
    Fx1 = _einsum("...ij,...nj->...ni", F, x1h)
    Ftx2 = _einsum("...ji,...nj->...ni", F, x2h)
    num = _einsum("...ni,...ni->...n", x2h, Fx1) ** 2
    den = (Fx1[..., 0] ** 2 + Fx1[..., 1] ** 2
           + Ftx2[..., 0] ** 2 + Ftx2[..., 1] ** 2)
    return num / (den + 1e-12)


def ransac_fundamental(key, x1, x2, num_hypotheses: int = 64,
                       sample_size: int = 8, inlier_thresh: float = 1e-3):
    """Vectorized RANSAC: static hypothesis count, no data-dependent loops.

    Draw ``num_hypotheses`` random 8-point subsets at once, estimate all F
    candidates in one batched 8-point solve, score all by Sampson distance,
    pick the best, then refit on its inlier set (soft weights). x1/x2:
    (N, 2). Returns (F (3,3), inlier_mask (N,)).
    """
    n = x1.shape[-2]
    # sample WITHOUT replacement per hypothesis: a duplicated row makes the
    # 8-point system rank-deficient (2D null space -> junk F), which at
    # n~30 would poison the majority of hypotheses
    keys = jax.random.split(key, num_hypotheses)
    idx = jax.vmap(
        lambda k: jax.random.permutation(k, n)[:sample_size])(keys)
    s1 = x1[idx]                                         # (H, 8, 2)
    s2 = x2[idx]
    Fs = estimate_fundamental(s1, s2)                    # (H, 3, 3)
    d = sampson_distance(Fs, x1[None], x2[None])         # (H, N)
    inliers = d < inlier_thresh
    score = inliers.sum(axis=-1)
    best = jnp.argmax(score)
    w = inliers[best].astype(x1.dtype)
    F = estimate_fundamental(x1, x2, weights=w)
    return F, sampson_distance(F, x1, x2) < inlier_thresh
