"""Refinement unit: martinez-style residual MLP denoising 3D poses.

Reference: the stand-alone ``refiner/`` module (SURVEY.md §2.A [M]) used to
post-process triangulated pseudo-GT / predictions ("SS + R" rows). A
Linear(1024)->BN->ReLU->Dropout stem, two residual blocks of two such layers,
and a final linear head back to the flattened pose.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class _LinearBlock(nn.Module):
    size: int
    dropout: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Dense(self.size, dtype=self.dtype)(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=jnp.float32)(y)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        return y


class _ResidualBlock(nn.Module):
    size: int
    dropout: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = _LinearBlock(self.size, self.dropout, self.dtype)(x, train)
        y = _LinearBlock(self.size, self.dropout, self.dtype)(y, train)
        return x + y


class PoseRefiner(nn.Module):
    """Input/output: (N, J, 3) root-relative 3D poses (flattened inside)."""

    num_joints: int = 17
    hidden_size: int = 1024
    num_blocks: int = 2
    dropout: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pose, train: bool = False):
        n = pose.shape[0]
        x = pose.reshape(n, -1).astype(self.dtype)
        x = _LinearBlock(self.hidden_size, self.dropout, self.dtype)(x, train)
        for _ in range(self.num_blocks):
            x = _ResidualBlock(self.hidden_size, self.dropout,
                               self.dtype)(x, train)
        out = nn.Dense(self.num_joints * 3, dtype=self.dtype)(x)
        # residual connection to the input pose: the refiner learns a delta
        return pose + out.reshape(n, self.num_joints, 3).astype(pose.dtype)
