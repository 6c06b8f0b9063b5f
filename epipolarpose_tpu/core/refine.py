"""Refiner training: denoise triangulated 3D poses (reference ``refiner/``).

The reference's refinement unit is a stand-alone residual MLP trained on
(noisy triangulated pose, GT pose) pairs and applied to pseudo-GT and/or
predictions ("SS + R" rows — SURVEY.md §2.A [M]). Here:

- pairs come either from real triangulation outputs or from a structured
  noise model over GT poses (per-joint anisotropic Gaussian + occasional
  outlier joints, mimicking triangulation failure modes);
- training is a plain jitted MSE/L1 step over root-relative poses.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from epipolarpose_tpu.core.train_state import TrainState
from epipolarpose_tpu.models.refiner import PoseRefiner


def synth_noise(key, poses, sigma_mm: float = 25.0,
                outlier_prob: float = 0.05, outlier_mm: float = 150.0):
    """Triangulation-like corruption of GT poses. poses: (N, J, 3) mm."""
    k1, k2, k3 = jax.random.split(key, 3)
    noise = jax.random.normal(k1, poses.shape) * sigma_mm
    outliers = jax.random.normal(k2, poses.shape) * outlier_mm
    is_out = (jax.random.uniform(k3, poses.shape[:-1] + (1,))
              < outlier_prob)
    return poses + jnp.where(is_out, outliers, noise)


def create_refiner_state(num_joints: int, rng, lr: float = 1e-3,
                         hidden: int = 1024, blocks: int = 2,
                         dropout: float = 0.5):
    model = PoseRefiner(num_joints=num_joints, hidden_size=hidden,
                        num_blocks=blocks, dropout=dropout)
    dummy = jnp.zeros((1, num_joints, 3), jnp.float32)
    variables = model.init(rng, dummy, train=False)
    tx = optax.adam(lr)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        tx=tx)
    return model, state


def make_refiner_train_step(model, loss_type: str = "l1"):
    """(state, noisy (N,J,3), gt (N,J,3), rng) -> (state, loss)."""

    def step(state, noisy, gt, rng):
        def loss_fn(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                noisy, train=True, mutable=["batch_stats"],
                rngs={"dropout": rng})
            err = out - gt
            loss = jnp.mean(jnp.abs(err)) if loss_type == "l1" \
                else jnp.mean(err ** 2)
            return loss, mutated["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads, new_batch_stats=new_stats), loss

    return jax.jit(step)


def make_refiner_apply(model):
    def apply(state, poses):
        return model.apply({"params": state.params,
                            "batch_stats": state.batch_stats},
                           poses, train=False)
    return jax.jit(apply)
