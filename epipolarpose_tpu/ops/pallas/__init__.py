"""Pallas TPU kernels for the framework's hot non-conv ops."""

from epipolarpose_tpu.ops.pallas.softargmax import (  # noqa: F401
    fused_softmax_integral,
)
