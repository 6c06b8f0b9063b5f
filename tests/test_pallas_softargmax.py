"""Fused Pallas soft-argmax vs the XLA reference (interpret mode on CPU)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from epipolarpose_tpu.ops import softmax_integral
from epipolarpose_tpu.ops.pallas.softargmax import fused_softmax_integral


def _interp(fn):
    @functools.wraps(fn)
    def wrapped(*a, **k):
        with pltpu.force_tpu_interpret_mode():
            return fn(*a, **k)
    return wrapped


@pytest.mark.parametrize("shape", [(2, 16, 16, 3 * 4), (1, 32, 24, 5 * 8)])
def test_forward_matches_reference(shape, rng):
    n, H, W, C = shape
    D = 4 if C == 12 else 8
    J = C // D
    logits = jnp.asarray(rng.standard_normal(shape).astype(np.float32) * 3)
    ref = softmax_integral(logits, J, D)
    out = _interp(fused_softmax_integral)(logits, J, D, 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_forward_2d_mode(rng):
    logits = jnp.asarray(rng.standard_normal((2, 16, 16, 6)).astype(
        np.float32))
    ref = softmax_integral(logits, 6, 1)
    out = _interp(fused_softmax_integral)(logits, 6, 1, 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_extreme_logits_stable(rng):
    """Online renormalization must survive large-magnitude logits."""
    logits = jnp.asarray(
        rng.standard_normal((1, 16, 16, 8)).astype(np.float32) * 80)
    ref = softmax_integral(logits, 2, 4)
    out = _interp(fused_softmax_integral)(logits, 2, 4, 8)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_gradient_matches_reference(rng):
    logits = jnp.asarray(rng.standard_normal((2, 16, 16, 3 * 4)).astype(
        np.float32))
    gcoords = jnp.asarray(rng.standard_normal((2, 3, 3)).astype(np.float32))

    def loss_ref(lg):
        return jnp.sum(softmax_integral(lg, 3, 4) * gcoords)

    def loss_fused(lg):
        return jnp.sum(fused_softmax_integral(lg, 3, 4, 8) * gcoords)

    g_ref = jax.grad(loss_ref)(logits)
    g_fused = _interp(jax.grad(loss_fused))(logits)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               atol=1e-5)


def test_bf16_input(rng):
    logits = jnp.asarray(rng.standard_normal((1, 16, 16, 8)),
                         jnp.bfloat16)
    ref = softmax_integral(logits, 2, 4)
    out = _interp(fused_softmax_integral)(logits, 2, 4, 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)
