"""Flip-test correctness for BOTH heads (reference validate path, SURVEY
§3.4): the 2D head un-flips with a channel permutation; the 3D/integral head
must permute J-BLOCKS of D depth channels (channel = j*D + d) — permuting
raw channel indices corrupts depth bins of the wrong joints (the round-1
latent bug, VERDICT.md weak #1)."""

import jax.numpy as jnp
import numpy as np

from epipolarpose_tpu.config import load_config
from epipolarpose_tpu.core.steps import make_eval_step
from epipolarpose_tpu.geometry.affine import flip_back, flip_back_volume
from epipolarpose_tpu.ops.integral import softmax_integral

PAIRS = ((1, 4), (2, 5))
J, D, H, W = 6, 8, 16, 16


def _mirrored_volume(v):
    """What a perfectly equivariant net outputs on the mirrored image:
    W reversed, joint identities swapped, depth bins unchanged."""
    perm = list(range(J))
    for a, b in PAIRS:
        perm[a], perm[b] = perm[b], perm[a]
    vol = v.reshape(v.shape[:-1] + (J, D))
    vol = vol[..., :, ::-1, :, :][..., perm, :]
    return vol.reshape(v.shape)


def test_flip_back_volume_exact_roundtrip(rng):
    v = jnp.asarray(rng.standard_normal((2, H, W, J * D)), jnp.float32)
    out = flip_back_volume(_mirrored_volume(v), PAIRS, J, D)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(v))


def test_flip_back_volume_decode_is_mirror(rng):
    """Decoded coords of the mirrored volume are the mirrored decode:
    x negated (up to the 1-index-grid offset), y/z/joint-id preserved."""
    v = jnp.asarray(rng.standard_normal((2, H, W, J * D)) * 3, jnp.float32)
    c = np.asarray(softmax_integral(v, J, D))
    cf = np.asarray(softmax_integral(_mirrored_volume(v), J, D))
    perm = list(range(J))
    for a, b in PAIRS:
        perm[a], perm[b] = perm[b], perm[a]
    # x' = ((W-1-ex)/W - 0.5) = -x - 1/W ; y and z unchanged
    np.testing.assert_allclose(cf[:, perm, 0], -c[..., 0] - 1.0 / W,
                               atol=1e-5)
    np.testing.assert_allclose(cf[:, perm, 1], c[..., 1], atol=1e-5)
    np.testing.assert_allclose(cf[:, perm, 2], c[..., 2], atol=1e-5)


def test_raw_channel_flip_is_wrong_for_volumes(rng):
    """Pin the round-1 bug: plain flip_back on a J*D volume does NOT invert
    the mirror (it permutes depth bins across joints)."""
    v = jnp.asarray(rng.standard_normal((1, H, W, J * D)), jnp.float32)
    bad = flip_back(_mirrored_volume(v), PAIRS)
    assert np.abs(np.asarray(bad) - np.asarray(v)).max() > 0.5


class _PoolNet:
    """Deterministic, exactly flip-equivariant stand-in model: 4x4 average
    pooling of the input drives every (H, W) map; depth profile fixed per
    joint. pooled(flip(img)) == flip(pooled(img)) exactly, so the eval
    step's flip path must be a no-op for it."""

    def __init__(self, num_joints, depth_dim):
        self.J, self.D = num_joints, depth_dim
        rng = np.random.default_rng(0)
        self.wc = jnp.asarray(rng.uniform(0.5, 1.5, (num_joints, 3)),
                              jnp.float32)
        self.depth = jnp.asarray(rng.standard_normal((num_joints,
                                                      depth_dim)),
                                 jnp.float32)

    def apply(self, variables, imgs, train=False, **kw):
        N, Hi, Wi, _ = imgs.shape
        pooled = imgs.reshape(N, Hi // 4, 4, Wi // 4, 4, 3).mean((2, 4))
        hm = jnp.einsum("nhwc,jc->nhwj", pooled, self.wc)
        out = hm[..., :, None] * self.depth  # (N, h, w, J, D)
        return out.reshape(N, Hi // 4, Wi // 4, self.J * self.D)


def test_eval_step_integral_flip_test_consistent():
    """End-to-end: with an exactly equivariant model, FLIP_TEST on/off must
    decode identically (the broken per-channel flip corrupted z and joint
    identity here)."""
    cfg = load_config("experiments/h36m/valid_r50_256_integral.yaml")
    cfg.MODEL.NUM_JOINTS = J
    cfg.MODEL.IMAGE_SIZE = [64, 64]
    cfg.MODEL.EXTRA.HEATMAP_SIZE = [16, 16]
    cfg.MODEL.EXTRA.DEPTH_DIM = D
    cfg.TEST.SHIFT_HEATMAP = False   # exactness: no stride-offset heuristic
    model = _PoolNet(J, D)

    import collections
    S = collections.namedtuple("S", ["params", "batch_stats"])  # jit-able

    rng = np.random.default_rng(1)
    batch = {
        "input": jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)), jnp.float32),
        "center": jnp.full((2, 2), 32.0),
        "scale": jnp.full((2, 2), 64 / 200.0),
    }
    cfg.TEST.FLIP_TEST = False
    base = np.asarray(make_eval_step(cfg, model, flip_pairs=())(
        S({}, {}), batch)["preds"])
    cfg.TEST.FLIP_TEST = True
    flipped = np.asarray(make_eval_step(cfg, model, flip_pairs=())(
        S({}, {}), batch)["preds"])
    np.testing.assert_allclose(flipped, base, atol=1e-3)
    assert np.isfinite(flipped).all()
