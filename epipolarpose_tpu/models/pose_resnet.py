"""PoseResNet: ResNet backbone + deconv head + 1x1 final conv, in Flax.

TPU-first re-design of the reference's ``lib/models/pose_resnet.py``
(simple-baselines lineage — SURVEY.md §2.A [H]):

- NHWC layout throughout (TPU-native; the reference is NCHW).
- bf16 compute / f32 params (+ f32 BN statistics, kept by flax) by default.
- identical architecture semantics: ResNet-{18,34,50,101,152} backbone,
  ``NUM_DECONV_LAYERS`` x (ConvTranspose k4 s2 + BN + ReLU) head, then a
  ``FINAL_CONV_KERNEL``-sized conv emitting ``NUM_JOINTS`` channels (2D
  heatmaps) or ``NUM_JOINTS * DEPTH_DIM`` channels (3D integral volumes).
- optional ``jax.checkpoint`` rematerialisation of backbone stages for the
  384x384 / ResNet-152 memory budget (cfg.TPU.REMAT).

Weight init mirrors the reference ``init_weights``: deconv/final conv
normal(std=0.001); backbone He-normal; BN gamma=1 beta=0.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

ModuleDef = Any

# layers-per-stage for each depth (reference resnet_spec [H])
RESNET_SPEC = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}

_head_init = nn.initializers.normal(stddev=0.001)
_backbone_init = nn.initializers.variance_scaling(2.0, "fan_out",
                                                  "truncated_normal")


class BasicBlock(nn.Module):
    filters: int
    strides: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = _norm(train, self.dtype)
        residual = x
        y = nn.Conv(self.filters, (3, 3), (self.strides, self.strides),
                    padding=1, use_bias=False, dtype=self.dtype,
                    kernel_init=_backbone_init)(x)
        y = norm(name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, kernel_init=_backbone_init)(y)
        y = norm(name="bn2")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.filters, (1, 1),
                               (self.strides, self.strides), use_bias=False,
                               dtype=self.dtype, name="downsample_conv",
                               kernel_init=_backbone_init)(residual)
            residual = norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    filters: int            # bottleneck width; output is 4*filters
    strides: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = _norm(train, self.dtype)
        residual = x
        y = nn.Conv(self.filters, (1, 1), use_bias=False, dtype=self.dtype,
                    kernel_init=_backbone_init)(x)
        y = norm(name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), (self.strides, self.strides),
                    padding=1, use_bias=False, dtype=self.dtype,
                    kernel_init=_backbone_init)(y)
        y = norm(name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters * 4, (1, 1), use_bias=False,
                    dtype=self.dtype, kernel_init=_backbone_init)(y)
        y = norm(name="bn3")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.filters * 4, (1, 1),
                               (self.strides, self.strides), use_bias=False,
                               dtype=self.dtype, name="downsample_conv",
                               kernel_init=_backbone_init)(residual)
            residual = norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


def conv_transpose_fast(x, kernel, dtype):
    """ConvTranspose(k4, s2, 'SAME') as ONE dense k2 conv + parity interleave.

    Mathematically identical to flax's ConvTranspose (max diff ~2e-7,
    pinned in tests) but avoids the input-dilated convolution lowering:
    flax/XLA computes transposed convs by zero-stuffing the input, which
    wastes 3/4 of the MXU work; here each output-parity class (oy%2, ox%2)
    is a standard 2x2/stride-1 conv over the 1-padded input (mapping
    oy = 2·iy + 2 − ky, recovered in tests), all four fused into one conv
    with 4x output channels, then interleaved (depth-to-space).

    kernel: (4, 4, Cin, Cout) — the SAME parameter ConvTranspose uses, so
    checkpoints are interchangeable between the two paths.
    """
    N, H, W, Cin = x.shape
    Cout = kernel.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    idx = {0: (0, 2), 1: (1, 3)}
    subs = []
    for ay in (0, 1):
        for ax in (0, 1):
            subs.append(kernel[jnp.asarray(idx[ay])][:, jnp.asarray(idx[ax])])
    Kcat = jnp.concatenate(subs, axis=-1).astype(dtype)     # (2,2,Cin,4Cout)
    y = jax.lax.conv_general_dilated(
        xp.astype(dtype), Kcat, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    outs = []
    k = 0
    for ay in (0, 1):
        for ax in (0, 1):
            outs.append(y[:, ay:ay + H, ax:ax + W, k * Cout:(k + 1) * Cout])
            k += 1
    o = jnp.stack(outs, axis=3).reshape(N, H, W, 2, 2, Cout)
    return o.transpose(0, 1, 3, 2, 4, 5).reshape(N, 2 * H, 2 * W, Cout)


class _FastDeconv(nn.Module):
    """Parameter-compatible stand-in for ConvTranspose(k4, s2, 'SAME')."""

    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", _head_init,
                            (4, 4, x.shape[-1], self.features))
        return conv_transpose_fast(x, kernel, self.dtype)


def _norm(train: bool, dtype=jnp.bfloat16):
    # BN follows the compute dtype (params/stats stay f32 in flax); bf16 BN
    # avoids four extra full-activation HBM passes per block vs f32 BN
    # (~11% step time) and is standard for TPU ResNet training
    def make(name=None):
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, dtype=dtype, name=name)
    return make


class PoseResNet(nn.Module):
    """Backbone + deconv head + final conv. Input NHWC, output NHWC heatmaps
    (N, H/4, W/4, NUM_JOINTS * DEPTH_DIM)."""

    num_layers: int = 50
    num_joints: int = 16
    depth_dim: int = 1              # 1 = 2D heatmaps; >1 = integral volume
    num_deconv_layers: int = 3
    num_deconv_filters: Sequence[int] = (256, 256, 256)
    num_deconv_kernels: Sequence[int] = (4, 4, 4)
    final_conv_kernel: int = 1
    deconv_with_bias: bool = False
    dtype: Any = jnp.bfloat16
    remat: bool = False
    # parity-decomposed deconv (same params). MEASURED SLOWER end-to-end
    # on v5e (1322 vs 1459 img/s flagship train): XLA's input-dilated
    # lowering is already efficient and the parity interleave costs two
    # extra HBM passes of the output per deconv. Kept as an option;
    # checkpoint-interchangeable either way.
    fast_deconv: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_name, stages = RESNET_SPEC[self.num_layers]
        block_cls = BasicBlock if block_name == "basic" else Bottleneck
        if self.remat:
            block_cls = nn.remat(block_cls, static_argnums=(2,))
        norm = _norm(train, self.dtype)

        x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), (2, 2), padding=3, use_bias=False,
                    dtype=self.dtype, name="conv1",
                    kernel_init=_backbone_init)(x)
        x = norm(name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), (2, 2), padding=((1, 1), (1, 1)))

        filters = (64, 128, 256, 512)
        for i, (f, n_blocks) in enumerate(zip(filters, stages)):
            for b in range(n_blocks):
                strides = 2 if (i > 0 and b == 0) else 1
                x = block_cls(f, strides, self.dtype,
                              name=f"layer{i + 1}_{b}")(x, train)

        # deconv head: k4 s2 x3 (reference _make_deconv_layer [H])
        for i in range(self.num_deconv_layers):
            k = self.num_deconv_kernels[i]
            filters = self.num_deconv_filters[i]
            if self.fast_deconv and k == 4 and not self.deconv_with_bias:
                # identical math + identical parameter tree (see
                # conv_transpose_fast); avoids the input-dilated conv
                x = _FastDeconv(filters, self.dtype,
                                name=f"deconv{i + 1}")(x)
            else:
                # torch's (k=4, s=2, p=1) deconv == flax 'SAME' here: both
                # give exact 2x upsampling with the same spatial alignment
                # (verified against the torch oracle in tests/test_models.py)
                x = nn.ConvTranspose(
                    filters, (k, k), (2, 2),
                    padding="SAME", use_bias=self.deconv_with_bias,
                    dtype=self.dtype, kernel_init=_head_init,
                    name=f"deconv{i + 1}")(x)
            x = norm(name=f"deconv_bn{i + 1}")(x)
            x = nn.relu(x)

        k = self.final_conv_kernel
        pad = 1 if k == 3 else 0
        x = nn.Conv(self.num_joints * self.depth_dim, (k, k), padding=pad,
                    dtype=self.dtype, kernel_init=_head_init,
                    name="final_layer")(x)
        # keep the native dtype: upcasting the J*D volume here would
        # materialize it in f32 (1.1 GB for the flagship head at batch 64);
        # consumers (softmax_integral, losses) upcast inside fused reductions
        return x


def get_pose_net(cfg, is_train: bool = True) -> PoseResNet:
    """Factory mirroring reference ``get_pose_net(cfg, is_train)`` [H].

    (is_train only affects weight loading in the reference; module behavior
    here is selected per-call via the ``train`` argument.)
    """
    extra = cfg.MODEL.EXTRA
    return PoseResNet(
        num_layers=int(extra.NUM_LAYERS),
        num_joints=int(cfg.MODEL.NUM_JOINTS),
        depth_dim=int(extra.get("DEPTH_DIM", 1)),
        num_deconv_layers=int(extra.NUM_DECONV_LAYERS),
        num_deconv_filters=tuple(extra.NUM_DECONV_FILTERS),
        num_deconv_kernels=tuple(extra.NUM_DECONV_KERNELS),
        final_conv_kernel=int(extra.FINAL_CONV_KERNEL),
        deconv_with_bias=bool(extra.DECONV_WITH_BIAS),
        dtype=jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16"
        else jnp.float32,
        remat=bool(cfg.TPU.REMAT),
    )


def init_pose_net(model: PoseResNet, rng, image_size=(256, 256)):
    """Initialize variables with a dummy batch. Returns (params, batch_stats).

    image_size: (W, H) as in the config convention.
    """
    dummy = jnp.zeros((1, image_size[1], image_size[0], 3), jnp.float32)
    variables = model.init(rng, dummy, train=False)
    return variables["params"], variables["batch_stats"]
