"""Gaussian heatmap targets and argmax decode, batched on device.

Reference semantics reproduced exactly (SURVEY.md §2.A):
- ``generate_target``: JointsDataset.generate_target [H] — per-joint 2D
  Gaussian with σ=SIGMA drawn in a truncated (6σ+1)² box around the
  *integer-quantized* joint position on the heatmap grid; joints whose box
  falls fully outside the map get target_weight 0.
- ``get_max_preds`` / ``get_final_preds``: lib/core/inference.py [H] —
  batch argmax decode with the quarter-pixel offset toward the larger
  neighbor when POST_PROCESS, then inverse-affine to source coords.

The reference runs these per-sample on host workers; here they are batched
jnp running inside the jitted step (north-star: fused on-TPU target gen).
"""

from __future__ import annotations

import jax.numpy as jnp

from epipolarpose_tpu.geometry.affine import transform_preds


def generate_target(joints, joints_vis, heatmap_size, sigma,
                    image_size):
    """Per-joint Gaussian heatmaps + target weights, batched.

    joints:      (..., J, 2) joint positions in IMAGE pixels.
    joints_vis:  (..., J) or (..., J, 1+) visibility (0/1).
    heatmap_size: (W, H); image_size: (W, H); sigma: scalar.

    Returns (target (..., H, W, J) NHWC, target_weight (..., J)).
    """
    W, H = int(heatmap_size[0]), int(heatmap_size[1])
    stride_x = image_size[0] / W
    stride_y = image_size[1] / H
    tmp_size = sigma * 3

    if joints_vis.ndim == joints.ndim:
        joints_vis = joints_vis[..., 0]

    # reference: mu = int(joint / stride + 0.5) — quantized center.
    # Python int() truncates toward zero (NOT floor), which matters for
    # joints left/above the crop (negative coords), so use trunc.
    mu_x = jnp.trunc(joints[..., 0] / stride_x + 0.5)
    mu_y = jnp.trunc(joints[..., 1] / stride_y + 0.5)

    # box bounds; fully-outside boxes zero the weight. Reference condition
    # is `br < 0` (NOT <= 0): a box with br == 0 keeps weight 1 and
    # supervises an all-zero map — reproduced exactly
    ul_x, ul_y = mu_x - tmp_size, mu_y - tmp_size
    br_x, br_y = mu_x + tmp_size + 1, mu_y + tmp_size + 1
    inside = ((ul_x < W) & (ul_y < H) & (br_x >= 0) & (br_y >= 0))
    weight = joints_vis.astype(jnp.float32) * inside.astype(jnp.float32)

    xs = jnp.arange(W, dtype=jnp.float32)
    ys = jnp.arange(H, dtype=jnp.float32)
    dx = xs - mu_x[..., None]                       # (..., J, W)
    dy = ys - mu_y[..., None]                       # (..., J, H)
    gx = jnp.exp(-(dx * dx) / (2.0 * sigma * sigma))
    gy = jnp.exp(-(dy * dy) / (2.0 * sigma * sigma))
    # truncate to the (6σ+1)² box exactly like the reference's patch paste
    gx = jnp.where(jnp.abs(dx) <= tmp_size, gx, 0.0)
    gy = jnp.where(jnp.abs(dy) <= tmp_size, gy, 0.0)
    g = gy[..., :, None] * gx[..., None, :]         # (..., J, H, W)
    g = g * weight[..., None, None]
    # NHWC: (..., H, W, J)
    return jnp.moveaxis(g, -3, -1), weight


def get_max_preds(heatmaps):
    """Batch argmax decode. heatmaps: (..., H, W, J) NHWC.

    Returns (preds (..., J, 2) as (x, y) float, maxvals (..., J)).
    Reference zeroes coords where maxval <= 0 (lib/core/inference.py [H]).
    """
    H, W = heatmaps.shape[-3], heatmaps.shape[-2]
    flat = heatmaps.reshape(heatmaps.shape[:-3] + (H * W, heatmaps.shape[-1]))
    idx = jnp.argmax(flat, axis=-2)                 # (..., J)
    maxvals = jnp.max(flat, axis=-2)
    x = (idx % W).astype(jnp.float32)
    y = (idx // W).astype(jnp.float32)
    preds = jnp.stack([x, y], axis=-1)
    mask = (maxvals > 0.0).astype(jnp.float32)[..., None]
    return preds * mask, maxvals


def _gather_hm(heatmaps, px, py):
    """heatmaps (..., H, W, J), px/py (..., J) int -> values (..., J)."""
    H, W = heatmaps.shape[-3], heatmaps.shape[-2]
    px = jnp.clip(px, 0, W - 1)
    py = jnp.clip(py, 0, H - 1)
    flat = heatmaps.reshape(heatmaps.shape[:-3] + (H * W, heatmaps.shape[-1]))
    lin = py * W + px                                # (..., J)
    return jnp.take_along_axis(flat, lin[..., None, :], axis=-2)[..., 0, :]


def post_process_preds(heatmaps, preds):
    """Quarter-pixel offset toward the larger neighbor (POST_PROCESS [H])."""
    H, W = heatmaps.shape[-3], heatmaps.shape[-2]
    px = preds[..., 0].astype(jnp.int32)
    py = preds[..., 1].astype(jnp.int32)
    dx = (_gather_hm(heatmaps, px + 1, py)
          - _gather_hm(heatmaps, px - 1, py))
    dy = (_gather_hm(heatmaps, px, py + 1)
          - _gather_hm(heatmaps, px, py - 1))
    offset = jnp.stack([jnp.sign(dx), jnp.sign(dy)], axis=-1) * 0.25
    ok = ((px > 1) & (px < W - 1) & (py > 1) & (py < H - 1))
    return preds + offset * ok[..., None].astype(jnp.float32)


def get_final_preds(heatmaps, center, scale, post_process: bool = True):
    """Full decode: argmax (+ quarter offset) -> source-image coords.

    heatmaps: (N, H, W, J); center/scale: (N, 2).
    Returns (preds_img (N, J, 2), maxvals (N, J)).
    """
    H, W = heatmaps.shape[-3], heatmaps.shape[-2]
    preds, maxvals = get_max_preds(heatmaps)
    if post_process:
        preds = post_process_preds(heatmaps, preds)
    preds = transform_preds(preds, center, scale, (W, H))
    return preds, maxvals
