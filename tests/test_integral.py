"""Soft-argmax integral regression vs closed-form and torch oracle."""

import numpy as np

from epipolarpose_tpu.ops import generate_integral_target, softmax_integral


def test_delta_volume_recovers_location(rng):
    """Expectation of a sharp peak = its location (SURVEY §4 unit test)."""
    N, J, D, H, W = 2, 3, 8, 16, 16
    logits = np.zeros((N, H, W, J * D), np.float32)
    gt = np.zeros((N, J, 3))
    for n in range(N):
        for j in range(J):
            x, y, z = rng.integers(0, W), rng.integers(0, H), \
                rng.integers(0, D)
            # channel layout: (..., H, W, J, D) flattened to J*D
            logits[n, y, x, j * D + z] = 50.0   # sharp peak
            gt[n, j] = [x / W - 0.5, y / H - 0.5, z / D - 0.5]
    coords = np.asarray(softmax_integral(logits, J, D))
    np.testing.assert_allclose(coords, gt, atol=1e-3)


def test_2d_mode_zero_depth(rng):
    N, J, H, W = 2, 4, 32, 32
    logits = rng.standard_normal((N, H, W, J)).astype(np.float32)
    coords = np.asarray(softmax_integral(logits, J, 1))
    assert coords.shape == (N, J, 3)
    np.testing.assert_allclose(coords[..., 2], 0.0)
    assert (coords[..., :2] >= -0.5).all() and (coords[..., :2] <= 0.5).all()


def test_matches_torch_oracle(rng):
    """Cross-check the full softmax-expectation against an in-test torch
    implementation of the integral-pose decode (numerical oracle only)."""
    import torch
    N, J, D, H, W = 2, 5, 4, 8, 8
    logits = rng.standard_normal((N, H, W, J * D)).astype(np.float32)

    # torch oracle: reshape to (N, J, D, H, W), softmax over DHW, expect
    t = torch.from_numpy(logits).reshape(N, H, W, J, D)
    t = t.permute(0, 3, 4, 1, 2).contiguous()        # (N, J, D, H, W)
    p = torch.softmax(t.reshape(N, J, -1), dim=-1).reshape(N, J, D, H, W)
    xs = torch.arange(W, dtype=torch.float32)
    ys = torch.arange(H, dtype=torch.float32)
    zs = torch.arange(D, dtype=torch.float32)
    ex = (p.sum(dim=(2, 3)) * xs).sum(-1) / W - 0.5
    ey = (p.sum(dim=(2, 4)) * ys).sum(-1) / H - 0.5
    ez = (p.sum(dim=(3, 4)) * zs).sum(-1) / D - 0.5
    oracle = torch.stack([ex, ey, ez], dim=-1).numpy()

    coords = np.asarray(softmax_integral(logits, J, D))
    np.testing.assert_allclose(coords, oracle, atol=1e-5)


def test_gradient_flows(rng):
    import jax
    import jax.numpy as jnp
    logits = jnp.asarray(rng.standard_normal((1, 8, 8, 6)).astype(np.float32))

    def loss(lg):
        c = softmax_integral(lg, 3, 2)
        return jnp.sum(c ** 2)

    g = jax.grad(loss)(logits)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_integral_target(rng):
    joints = np.array([[[64.0, 128.0], [300.0, 10.0]]], np.float32)
    vis = np.ones((1, 2), np.float32)
    depth = np.array([[100.0, 0.0]], np.float32)
    tgt, w = generate_integral_target(joints, vis, (256, 256),
                                      depth_bound=1000.0, joints_depth=depth)
    tgt, w = np.asarray(tgt), np.asarray(w)
    np.testing.assert_allclose(tgt[0, 0], [64 / 256 - 0.5, 0.0, 0.05])
    assert w[0, 0] == 1.0
    assert w[0, 1] == 0.0   # x=300 outside the 256 crop
