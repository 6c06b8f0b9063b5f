"""PoseResNet architecture + torch-checkpoint-converter parity tests.

The torch model built in-test is a numerical ORACLE reproducing the
reference architecture (SURVEY.md §4 golden-test strategy) — it is not part
of the framework.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from epipolarpose_tpu.config import config, load_config
from epipolarpose_tpu.models import (
    PoseRefiner, PoseResNet, convert_state_dict, get_model, init_pose_net,
)


def test_2d_output_shape():
    model = PoseResNet(num_layers=18, num_joints=16, dtype=jnp.float32)
    params, stats = init_pose_net(model, jax.random.PRNGKey(0), (64, 64))
    x = jnp.zeros((2, 64, 64, 3))
    out = model.apply({"params": params, "batch_stats": stats}, x)
    assert out.shape == (2, 16, 16, 16)    # stride 32 backbone, 3 deconvs x2


def test_3d_output_shape():
    model = PoseResNet(num_layers=18, num_joints=17, depth_dim=8,
                       dtype=jnp.float32)
    params, stats = init_pose_net(model, jax.random.PRNGKey(0), (64, 64))
    out = model.apply({"params": params, "batch_stats": stats},
                      jnp.zeros((1, 64, 64, 3)))
    assert out.shape == (1, 16, 16, 17 * 8)


def test_factory_from_config():
    cfg = config
    cfg.MODEL.EXTRA.NUM_LAYERS = 18
    model = get_model(cfg)
    assert isinstance(model, PoseResNet)
    assert model.depth_dim == 1
    cfg.MODEL.NAME = "nope"
    with pytest.raises(ValueError):
        get_model(cfg)


def test_train_mode_updates_batch_stats(rng):
    model = PoseResNet(num_layers=18, num_joints=4, dtype=jnp.float32)
    params, stats = init_pose_net(model, jax.random.PRNGKey(0), (32, 32))
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    out, mutated = model.apply({"params": params, "batch_stats": stats}, x,
                               train=True, mutable=["batch_stats"])
    new_stats = mutated["batch_stats"]
    assert not np.allclose(np.asarray(new_stats["bn1"]["mean"]),
                           np.asarray(stats["bn1"]["mean"]))


def _torch_pose_resnet18(num_joints=4, depth_dim=1):
    """In-test torch oracle of the reference architecture (resnet18 + 1
    deconv stage configuration scaled down where irrelevant)."""
    import torch
    import torch.nn as tnn

    class BasicBlock(tnn.Module):
        def __init__(self, cin, cout, stride=1):
            super().__init__()
            self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(cout)
            self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(cout)
            self.downsample = None
            if stride != 1 or cin != cout:
                self.downsample = tnn.Sequential(
                    tnn.Conv2d(cin, cout, 1, stride, bias=False),
                    tnn.BatchNorm2d(cout))

        def forward(self, x):
            r = x if self.downsample is None else self.downsample(x)
            y = torch.relu(self.bn1(self.conv1(x)))
            y = self.bn2(self.conv2(y))
            return torch.relu(y + r)

    class Net(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.maxpool = tnn.MaxPool2d(3, 2, 1)
            layers = []
            cin = 64
            for li, cout in enumerate([64, 128, 256, 512]):
                blocks = []
                for b in range(2):
                    stride = 2 if (li > 0 and b == 0) else 1
                    blocks.append(BasicBlock(cin, cout, stride))
                    cin = cout
                layers.append(tnn.Sequential(*blocks))
            self.layer1, self.layer2, self.layer3, self.layer4 = layers
            deconv = []
            cin = 512
            for _ in range(3):
                deconv += [
                    tnn.ConvTranspose2d(cin, 256, 4, 2, 1, bias=False),
                    tnn.BatchNorm2d(256), tnn.ReLU(inplace=True)]
                cin = 256
            self.deconv_layers = tnn.Sequential(*deconv)
            self.final_layer = tnn.Conv2d(256, num_joints * depth_dim, 1)

        def forward(self, x):
            x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
            x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
            return self.final_layer(self.deconv_layers(x))

    return Net()


def test_forward_matches_torch_oracle(rng):
    """Converted reference weights must reproduce the reference forward."""
    import torch
    torch.manual_seed(0)
    J = 4
    net = _torch_pose_resnet18(J).eval()
    # randomize BN running stats so eval-mode normalization is non-trivial
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.5, 1.5)
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        oracle = net(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    oracle = oracle.numpy().transpose(0, 2, 3, 1)      # NCHW -> NHWC

    variables = convert_state_dict(net.state_dict(), num_layers=18)
    model = PoseResNet(num_layers=18, num_joints=J, dtype=jnp.float32)
    out = model.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        jnp.asarray(x), train=False)
    out = np.asarray(out)
    assert out.shape == oracle.shape
    np.testing.assert_allclose(out, oracle, atol=2e-3, rtol=1e-3)


def test_refiner_shapes_and_residual(rng):
    model = PoseRefiner(num_joints=17)
    pose = jnp.asarray(rng.standard_normal((3, 17, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), pose, train=False)
    out = model.apply(variables, pose, train=False)
    assert out.shape == (3, 17, 3)
    # with zero-init final dense the output starts at the identity? not
    # guaranteed — but the delta must be finite and differentiable
    assert np.isfinite(np.asarray(out)).all()


def test_r50_bottleneck_shapes():
    model = PoseResNet(num_layers=50, num_joints=2, dtype=jnp.float32,
                       num_deconv_filters=(32, 32, 32))
    params, stats = init_pose_net(model, jax.random.PRNGKey(0), (64, 64))
    out = model.apply({"params": params, "batch_stats": stats},
                      jnp.zeros((1, 64, 64, 3)))
    assert out.shape == (1, 16, 16, 2)


def test_fast_deconv_matches_convtranspose(rng):
    """Parity-decomposed deconv must equal ConvTranspose with the SAME
    parameter tree (checkpoint-interchangeable)."""
    kwargs = dict(num_layers=18, num_joints=4, dtype=jnp.float32,
                  num_deconv_filters=(16, 16, 16))
    slow = PoseResNet(fast_deconv=False, **kwargs)
    fast = PoseResNet(fast_deconv=True, **kwargs)
    params, stats = init_pose_net(slow, jax.random.PRNGKey(0), (64, 64))
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    a = slow.apply({"params": params, "batch_stats": stats}, x)
    b = fast.apply({"params": params, "batch_stats": stats}, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_export_state_dict_roundtrip(rng):
    """export_state_dict is the exact inverse of convert_state_dict."""
    from epipolarpose_tpu.models import export_state_dict

    model = PoseResNet(num_layers=18, num_joints=4, dtype=jnp.float32,
                       num_deconv_filters=(16, 16, 16))
    params, stats = init_pose_net(model, jax.random.PRNGKey(1), (64, 64))
    # non-trivial batch_stats: one train-mode step moves the running stats
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    _, mutated = model.apply({"params": params, "batch_stats": stats}, x,
                             train=True, mutable=["batch_stats"])
    variables = {"params": params, "batch_stats": mutated["batch_stats"]}

    back = convert_state_dict(export_state_dict(variables), num_layers=18)
    flat_a = jax.tree_util.tree_flatten_with_path(variables)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(back)[0]
    assert [p for p, _ in flat_a] == [p for p, _ in flat_b]
    for (path, a), (_, b) in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(path))


def test_exported_weights_load_into_torch_oracle(rng):
    """Weights trained here load into the reference PyTorch model with
    strict=True and reproduce this framework's forward."""
    import torch
    from epipolarpose_tpu.models import export_state_dict

    J = 4
    model = PoseResNet(num_layers=18, num_joints=J, dtype=jnp.float32)
    params, stats = init_pose_net(model, jax.random.PRNGKey(2), (64, 64))
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    _, mutated = model.apply({"params": params, "batch_stats": stats},
                             jnp.asarray(x), train=True,
                             mutable=["batch_stats"])
    variables = {"params": params, "batch_stats": mutated["batch_stats"]}
    ours = np.asarray(model.apply(
        {"params": params, "batch_stats": variables["batch_stats"]},
        jnp.asarray(x), train=False))

    sd = {k: (torch.from_numpy(np.ascontiguousarray(v)) if np.ndim(v)
              else torch.tensor(v))
          for k, v in export_state_dict(variables).items()}
    net = _torch_pose_resnet18(J)
    net.load_state_dict(sd, strict=True)     # raises on any key mismatch
    net.eval()
    with torch.no_grad():
        oracle = net(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    oracle = oracle.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, oracle, atol=2e-3, rtol=1e-3)


def test_save_torch_checkpoint_file_roundtrip(tmp_path):
    """save_torch_checkpoint writes a .pth.tar the import path reads back."""
    from epipolarpose_tpu.models import (load_torch_checkpoint,
                                         save_torch_checkpoint)

    model = PoseResNet(num_layers=18, num_joints=2, dtype=jnp.float32,
                       num_deconv_filters=(8, 8, 8))
    params, stats = init_pose_net(model, jax.random.PRNGKey(3), (32, 32))
    variables = {"params": params, "batch_stats": stats}
    path = str(tmp_path / "exported.pth.tar")
    save_torch_checkpoint(path, variables)
    back = load_torch_checkpoint(path, num_layers=18)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(variables)[0],
            jax.tree_util.tree_flatten_with_path(back)[0]):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(pa))
