"""Integral pose regression: differentiable soft-argmax over joint volumes.

Reference: ``softmax_integral_tensor`` (integral-human-pose lineage,
arXiv:1711.08229 §3 — SURVEY.md §3.3 [M]). The network's final conv emits
``J*D`` channels reshaped per joint into a (D, H, W) volume; softmax over the
flattened volume, then the expectation over x/y/z index grids gives
continuous sub-pixel coordinates, normalized to [-0.5, 0.5).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def softmax_integral(logits, num_joints: int, depth_dim: int = 1):
    """Soft-argmax decode of volumetric heatmap logits.

    logits: (..., H, W, J*D) NHWC as emitted by the model's final conv.
    Returns normalized coords (..., J, 3) in [-0.5, 0.5): (x, y, z).
    For depth_dim == 1 the z output is identically 0 (2D integral mode).

    TPU note: everything reduces IN the native (H, W, J, D) layout — no
    moveaxis/transpose. For the flagship head that volume is 1.1 GB in f32
    per batch-64; a layout transpose would cost two full HBM round-trips
    (plus two more in the backward pass). The expectations are computed as
    fused weighted reductions over the exp'd volume instead; accumulation
    is f32 even for bf16 logits.
    """
    H, W = logits.shape[-3], logits.shape[-2]
    D = depth_dim
    lead = logits.shape[:-3]
    vol = logits.reshape(lead + (H, W, num_joints, D))
    # stop_gradient on the stabilizer: softmax is analytically invariant to
    # the subtracted constant, but letting AD differentiate through max
    # builds a full-volume scatter mask in the backward pass — measured
    # 1.6 ms/step on the flagship head (VERDICT r1 item 5 profile)
    m = jax.lax.stop_gradient(
        jnp.max(vol, axis=(-4, -3, -1), keepdims=True))  # per-joint max
    e = jnp.exp((vol - m).astype(jnp.float32))          # (..., H, W, J, D)

    xs = jnp.arange(W, dtype=jnp.float32)
    ys = jnp.arange(H, dtype=jnp.float32)
    zs = jnp.arange(D, dtype=jnp.float32)
    Z = jnp.sum(e, axis=(-4, -3, -1))                   # (..., J)
    ex = jnp.sum(e * xs[:, None, None], axis=(-4, -3, -1))
    ey = jnp.sum(e * ys[:, None, None, None], axis=(-4, -3, -1))
    ez = jnp.sum(e * zs, axis=(-4, -3, -1))
    x = ex / Z / W - 0.5
    y = ey / Z / H - 0.5
    z = ez / Z / D - 0.5
    if D == 1:
        z = jnp.zeros_like(z)
    return jnp.stack([x, y, z], axis=-1)


def generate_integral_target(joints_img, joints_vis, image_size,
                             depth_bound: float | None = None,
                             joints_depth=None):
    """Normalized integral regression targets + per-joint weights.

    joints_img: (..., J, 2) crop-space pixel coords; joints_depth: (..., J)
    root-relative depth (same units as ``depth_bound``, e.g. mm) or None for
    2D mode. Targets are normalized to [-0.5, 0.5) matching
    :func:`softmax_integral`'s output convention (reference: integral-pose
    target generation [M]).
    """
    if joints_vis.ndim == joints_img.ndim:
        joints_vis = joints_vis[..., 0]
    x = joints_img[..., 0] / image_size[0] - 0.5
    y = joints_img[..., 1] / image_size[1] - 0.5
    if joints_depth is None or depth_bound is None:
        z = jnp.zeros_like(x)
        z_ok = jnp.ones_like(x, dtype=bool)
    else:
        z = joints_depth / (2.0 * depth_bound)      # [-bound, bound] -> ±0.5
        z_ok = jnp.abs(z) <= 0.5
    inside = ((x >= -0.5) & (x < 0.5) & (y >= -0.5) & (y < 0.5) & z_ok)
    weight = joints_vis.astype(jnp.float32) * inside.astype(jnp.float32)
    target = jnp.stack([x, y, z], axis=-1)
    return target, weight


def integral_to_camera_depth(coords, depth_bound: float):
    """Undo z normalization: normalized z -> root-relative depth units."""
    return coords[..., 2] * (2.0 * depth_bound)
