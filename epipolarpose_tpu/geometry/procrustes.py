"""Procrustes / similarity alignment for PA-MPJPE (protocol 2).

Reference: ``compute_similarity_transform`` used by H36M evaluation
(lib/dataset/h36m.py lineage — SURVEY.md §2.A [M]). Batched jnp version:
given predicted and GT joint sets, find scale s, rotation R, translation t
minimizing ||s·X·R + t − Y||² (orthogonal Procrustes via 3x3 SVD).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from functools import partial

# Geometry is numerically sensitive and computationally tiny: never let
# XLA drop these contractions to bf16 on the MXU (accuracy collapses from
# ~1e-6 to ~1e-2 at pixel scales).
_einsum = partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)



def compute_similarity_transform(X, Y):
    """Optimal similarity transform params aligning X to Y.

    X, Y: (..., J, 3). Returns (s (...,), R (..., 3, 3), t (..., 3)) with the
    aligned points being ``s[...,None,None] * X @ R + t[...,None,:]``.
    """
    muX = X.mean(axis=-2, keepdims=True)
    muY = Y.mean(axis=-2, keepdims=True)
    X0 = X - muX
    Y0 = Y - muY
    normX2 = (X0 * X0).sum(axis=(-1, -2))
    # cross-covariance (3, 3)
    H = _einsum("...ji,...jk->...ik", X0, Y0)
    U, S, Vt = jnp.linalg.svd(H)
    # proper rotation: flip last column of V if det < 0
    det = jnp.linalg.det(_einsum("...ij,...jk->...ik",
                                    jnp.swapaxes(Vt, -1, -2),
                                    jnp.swapaxes(U, -1, -2)))
    sign = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det], axis=-1)
    R = _einsum("...ij,...jk->...ik",
                   jnp.swapaxes(Vt, -1, -2) * sign[..., None, :],
                   jnp.swapaxes(U, -1, -2))
    # R maps X-space -> Y-space acting on row vectors as X0 @ R^T; we return
    # R_row with aligned = X0 @ R_row, R_row = R^T
    R_row = jnp.swapaxes(R, -1, -2)
    trace = (S * sign).sum(axis=-1)
    s = trace / jnp.where(normX2 < 1e-12, 1e-12, normX2)
    t = (muY - s[..., None, None] *
         _einsum("...ij,...jk->...ik", muX, R_row))[..., 0, :]
    return s, R_row, t


def procrustes_align(X, Y):
    """Return X aligned onto Y by the optimal similarity transform."""
    s, R, t = compute_similarity_transform(X, Y)
    return s[..., None, None] * _einsum("...ij,...jk->...ik", X, R) \
        + t[..., None, :]
