"""cv2-compatible affine crop transforms, batched in jnp.

Reproduces the reference's ``lib/utils/transforms.py`` semantics
(simple-baselines lineage, SURVEY.md §2.A [H]) — the 3-point affine
construction (`get_affine_transform`), point application, prediction
un-mapping (`transform_preds`) and flip utilities — as pure, vmappable jnp.

Conventions (must match cv2 / the reference exactly):
- ``center``: (x, y) person center in source-image pixels.
- ``scale``:  (sx, sy) in "200-pixel units" — the crop box is ``scale*200``
  source pixels.
- ``rot``:    rotation in degrees.
- ``output_size``: (w, h) of the destination crop.
- The returned matrix ``M`` (2x3) maps SOURCE pixel coords -> DEST pixel
  coords, exactly like ``cv2.getAffineTransform(src_tri, dst_tri)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from functools import partial

# Geometry is numerically sensitive and computationally tiny: never let
# XLA drop these contractions to bf16 on the MXU (accuracy collapses from
# ~1e-6 to ~1e-2 at pixel scales).
_einsum = partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)



def get_dir(src_point, rot_rad):
    """Rotate a 2D vector by ``rot_rad`` radians (reference ``get_dir`` [H])."""
    src_point = jnp.asarray(src_point, jnp.float32)
    sn, cs = jnp.sin(rot_rad), jnp.cos(rot_rad)
    return jnp.stack([
        src_point[..., 0] * cs - src_point[..., 1] * sn,
        src_point[..., 0] * sn + src_point[..., 1] * cs,
    ], axis=-1)


def get_3rd_point(a, b):
    """Third triangle vertex: b + perp(a - b) (reference ``get_3rd_point``)."""
    d = a - b
    return b + jnp.stack([-d[..., 1], d[..., 0]], axis=-1)


def _solve_affine(src, dst):
    """Exact 2x3 affine M with dst_i = M @ [src_i; 1] for 3 point pairs.

    Equivalent to ``cv2.getAffineTransform(src, dst)``; solved as a 3x3
    linear system per output row. ``src``/``dst``: (..., 3, 2).
    """
    ones = jnp.ones(src.shape[:-1] + (1,), src.dtype)
    A = jnp.concatenate([src, ones], axis=-1)            # (..., 3, 3)
    # Solve A @ X = dst  -> X is (..., 3, 2);  M = X^T  (..., 2, 3)
    X = jnp.linalg.solve(A, dst)
    return jnp.swapaxes(X, -1, -2)


def get_affine_transform(center, scale, rot, output_size, shift=(0.0, 0.0),
                         inv: bool = False):
    """Build the crop affine exactly like the reference (3-point method).

    All array args broadcast over leading batch dims. Returns (..., 2, 3).
    """
    center = jnp.asarray(center, jnp.float32)
    scale = jnp.asarray(scale, jnp.float32)
    if scale.ndim == center.ndim - 1 or scale.ndim == 0:
        scale = scale[..., None] * jnp.ones_like(center)
    shift = jnp.asarray(shift, jnp.float32)
    rot = jnp.asarray(rot, jnp.float32)

    scale_tmp = scale * 200.0
    src_w = scale_tmp[..., 0]
    dst_w = jnp.float32(output_size[0])
    dst_h = jnp.float32(output_size[1])

    rot_rad = jnp.pi * rot / 180.0
    zeros = jnp.zeros_like(src_w)
    src_dir = get_dir(jnp.stack([zeros, src_w * -0.5], axis=-1), rot_rad)
    dst_dir = jnp.stack(
        [jnp.zeros_like(dst_w * src_w), (dst_w * -0.5) * jnp.ones_like(src_w)],
        axis=-1)

    src0 = center + scale_tmp * shift
    src1 = center + src_dir + scale_tmp * shift
    src2 = get_3rd_point(src0, src1)

    dst_c = jnp.stack([dst_w * 0.5 * jnp.ones_like(src_w),
                       dst_h * 0.5 * jnp.ones_like(src_w)], axis=-1)
    dst0 = dst_c
    dst1 = dst_c + dst_dir
    dst2 = get_3rd_point(dst0, dst1)

    src = jnp.stack([src0, src1, src2], axis=-2)
    dst = jnp.stack([dst0, dst1, dst2], axis=-2)
    if inv:
        src, dst = dst, src
    return _solve_affine(src, dst)


def get_affine_transform_np(center, scale, rot, output_size,
                            shift=(0.0, 0.0), inv: bool = False):
    """Pure-NUMPY twin of :func:`get_affine_transform` for the HOST data
    pipeline. Identical math (parity-tested); exists because dispatching
    tiny jnp ops per sample/batch from the data loader costs orders of
    magnitude more than the arithmetic (device round-trips on a TPU host).
    """
    import numpy as np
    center = np.asarray(center, np.float32)
    scale = np.asarray(scale, np.float32)
    if scale.ndim == center.ndim - 1 or scale.ndim == 0:
        scale = scale[..., None] * np.ones_like(center)
    shift = np.asarray(shift, np.float32)
    rot = np.asarray(rot, np.float32)

    scale_tmp = scale * 200.0
    src_w = scale_tmp[..., 0]
    dst_w = np.float32(output_size[0])
    dst_h = np.float32(output_size[1])

    rot_rad = np.pi * rot / 180.0
    sn, cs = np.sin(rot_rad), np.cos(rot_rad)
    # rotate (0, -0.5*src_w) by rot_rad
    src_dir = np.stack([(src_w * 0.5) * sn, (src_w * -0.5) * cs], axis=-1)
    dst_dir = np.stack([np.zeros_like(src_w),
                        (dst_w * -0.5) * np.ones_like(src_w)], axis=-1)

    def third(a, b):
        d = a - b
        return b + np.stack([-d[..., 1], d[..., 0]], axis=-1)

    src0 = center + scale_tmp * shift
    src1 = center + src_dir + scale_tmp * shift
    dst0 = np.stack([dst_w * 0.5 * np.ones_like(src_w),
                     dst_h * 0.5 * np.ones_like(src_w)], axis=-1)
    dst1 = dst0 + dst_dir
    src = np.stack([src0, src1, third(src0, src1)], axis=-2)
    dst = np.stack([dst0, dst1, third(dst0, dst1)], axis=-2)
    if inv:
        src, dst = dst, src
    ones = np.ones(src.shape[:-1] + (1,), np.float32)
    A = np.concatenate([src, ones], axis=-1)
    X = np.linalg.solve(A, dst)
    return np.swapaxes(X, -1, -2).astype(np.float32)


def invert_affine(M):
    """Invert a (..., 2, 3) affine map."""
    A = M[..., :, :2]
    t = M[..., :, 2]
    Ainv = jnp.linalg.inv(A)
    tinv = -_einsum("...ij,...j->...i", Ainv, t)
    return jnp.concatenate([Ainv, tinv[..., None]], axis=-1)


def affine_transform(pt, M):
    """Apply (..., 2, 3) affine to points (..., 2) / (..., N, 2)."""
    pt = jnp.asarray(pt, jnp.float32)
    return _einsum("...ij,...j->...i", M[..., :, :2], pt) + M[..., :, 2]


def transform_preds(coords, center, scale, output_size):
    """Map heatmap-space predictions back to source-image pixels.

    Reference ``transform_preds`` (lib/utils/transforms.py [H]): applies the
    inverse crop affine per point. ``coords``: (..., J, 2); center/scale:
    (..., 2); heatmap ``output_size``: (w, h).
    """
    M = get_affine_transform(center, scale, 0.0, output_size, inv=True)
    return affine_transform(coords, M[..., None, :, :])


def fliplr_joints(joints, joints_vis, width, matched_parts):
    """Horizontally flip joints and swap left/right pairs (reference [H]).

    ``joints``: (..., J, C>=2); ``width``: source image width in px.
    """
    joints = jnp.asarray(joints, jnp.float32)
    x = width - 1.0 - joints[..., 0]
    joints = joints.at[..., 0].set(x)
    perm = _pair_permutation(joints.shape[-2], matched_parts)
    joints, joints_vis = joints[..., perm, :], joints_vis[..., perm, :]
    # reference returns joints*joints_vis: invisible joints' coords are
    # zeroed so downstream validity checks (target > 1) treat them as
    # invalid rather than seeing stale flipped coords
    return joints * joints_vis[..., :1].astype(joints.dtype), joints_vis


def flip_back(heatmaps, matched_parts):
    """Un-flip heatmaps from a flipped forward pass (reference ``flip_back``).

    ``heatmaps``: (..., H, W, J) NHWC — flip W and swap paired channels.
    """
    hm = heatmaps[..., :, ::-1, :]
    perm = _pair_permutation(hm.shape[-1], matched_parts)
    return hm[..., perm]


def flip_back_volume(logits, matched_parts, num_joints: int, depth_dim: int):
    """``flip_back`` for the integral head's volumetric output.

    The 3D head emits (..., H, W, J*D) with channel = j*D + d (see
    ops/integral.py): left/right swapping must permute whole J-BLOCKS of D
    depth channels — permuting raw channel indices (what :func:`flip_back`
    does) would swap depth BINS of the wrong joints. Depth itself is
    invariant under a horizontal mirror, so only W flips and joint identity
    swaps (reference flip-test on the H36M validate path, SURVEY §3.4 [M]).
    """
    if depth_dim == 1:
        return flip_back(logits, matched_parts)
    lead = logits.shape[:-1]
    vol = logits.reshape(lead + (num_joints, depth_dim))
    vol = vol[..., :, ::-1, :, :]                     # flip W (axis -3 here)
    perm = _pair_permutation(num_joints, matched_parts)
    vol = vol[..., perm, :]
    return vol.reshape(lead + (num_joints * depth_dim,))


def _pair_permutation(num_joints: int, matched_parts) -> jnp.ndarray:
    perm = list(range(num_joints))
    for a, b in matched_parts:
        perm[a], perm[b] = perm[b], perm[a]
    return jnp.asarray(perm, jnp.int32)
