"""On-device affine image warp with cv2.warpAffine semantics.

The reference crops/augments on host workers via ``cv2.warpAffine`` (bilinear,
constant zero border — JointsDataset.__getitem__, SURVEY.md §3.1). Moving the
warp on-device is a north-star item (BASELINE.json: "affine crop/warp
augmentation fused into an on-TPU preprocessing stage"): the host then only
decodes JPEGs, and the expensive resample rides the TPU inside the jitted
train step.

Matching cv2 conventions:
- ``M`` maps SOURCE -> DEST pixel coords (like cv2.warpAffine's ``M``);
  internally the inverse map is applied per dest pixel.
- pixel centers at integer coordinates; bilinear interpolation; out-of-bounds
  samples read as 0 (BORDER_CONSTANT, value 0).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from functools import partial

from epipolarpose_tpu.geometry.affine import invert_affine

# interpolation-weight matmuls must not drop to bf16 (sub-pixel accuracy)
_einsum = partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)


def warp_affine(images, M, output_size):
    """Batched bilinear affine warp.

    images: (N, Hs, Ws, C) float; M: (N, 2, 3) or (2, 3) src->dst affine;
    output_size: (Wd, Hd). Returns (N, Hd, Wd, C).
    """
    Wd, Hd = int(output_size[0]), int(output_size[1])
    N, Hs, Ws, C = images.shape
    if M.ndim == 2:
        M = jnp.broadcast_to(M, (N, 2, 3))
    Minv = invert_affine(M)

    xs = jnp.arange(Wd, dtype=jnp.float32)
    ys = jnp.arange(Hd, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)                    # (Hd, Wd)
    # src = Minv @ [x, y, 1]
    sx = (Minv[:, 0, 0, None, None] * gx + Minv[:, 0, 1, None, None] * gy
          + Minv[:, 0, 2, None, None])               # (N, Hd, Wd)
    sy = (Minv[:, 1, 0, None, None] * gx + Minv[:, 1, 1, None, None] * gy
          + Minv[:, 1, 2, None, None])

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def sample(yi, xi):
        ok = ((xi >= 0) & (xi < Ws) & (yi >= 0) & (yi < Hs))
        xi_c = jnp.clip(xi, 0, Ws - 1)
        yi_c = jnp.clip(yi, 0, Hs - 1)
        lin = yi_c * Ws + xi_c                       # (N, Hd, Wd)
        flat = images.reshape(N, Hs * Ws, C)
        vals = jnp.take_along_axis(
            flat, lin.reshape(N, Hd * Wd)[..., None], axis=1)
        vals = vals.reshape(N, Hd, Wd, C)
        return vals * ok[..., None].astype(images.dtype)

    v00 = sample(y0i, x0i)
    v01 = sample(y0i, x0i + 1)
    v10 = sample(y0i + 1, x0i)
    v11 = sample(y0i + 1, x0i + 1)
    fx = fx[..., None].astype(images.dtype)
    fy = fy[..., None].astype(images.dtype)
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy


def warp_affine_separable(images, M, output_size):
    """Axis-aligned affine warp (scale + translation, NO rotation/shear) as
    two interpolation matmuls — the TPU-fast path.

    Point gathers on TPU move one (sublane, lane) tile per index and waste
    1021/1024 of the memory transaction on 3-channel rows (measured:
    ~235 ms per 64x480x640 batch). A separable warp instead rides the MXU:
    ``out = Ky @ img @ Kxᵀ`` with per-image (Hd, Hs)/(Wd, Ws) linear-interp
    matrices, ~1000x less wall-clock for the rotation-free case (eval
    crops, the self-supervised teacher forward, FLIP_TEST).

    images: (N, Hs, Ws, C); M: (N, 2, 3) or (2, 3) src->dst affine with
    zero off-diagonal terms (M[...,0,1] == M[...,1,0] == 0 — not checked
    inside jit; rotation inputs silently produce wrong output, so callers
    dispatch on the static "is rotation enabled" config flag).
    Returns (N, Hd, Wd, C), out-of-bounds samples = 0 (cv2 BORDER_CONSTANT).
    """
    Wd, Hd = int(output_size[0]), int(output_size[1])
    N, Hs, Ws, C = images.shape
    if M.ndim == 2:
        M = jnp.broadcast_to(M, (N, 2, 3))
    Minv = invert_affine(M)
    # src coords are separable: sx = a*x + tx ; sy = b*y + ty
    a = Minv[:, 0, 0]
    tx = Minv[:, 0, 2]
    b = Minv[:, 1, 1]
    ty = Minv[:, 1, 2]

    def interp_matrix(scale, shift, n_dst, n_src):
        # K[n, d, s] = tri(scale*d + shift - s), zero outside the source
        d = jnp.arange(n_dst, dtype=jnp.float32)
        s = jnp.arange(n_src, dtype=jnp.float32)
        pos = scale[:, None] * d[None, :] + shift[:, None]     # (N, n_dst)
        w = 1.0 - jnp.abs(pos[:, :, None] - s[None, None, :])
        return jnp.maximum(w, 0.0)

    Ky = interp_matrix(b, ty, Hd, Hs)                          # (N, Hd, Hs)
    Kx = interp_matrix(a, tx, Wd, Ws)                          # (N, Wd, Ws)
    out = _einsum("nyh,nhwc->nywc", Ky, images)
    return _einsum("nxw,nywc->nyxc", Kx, out)
