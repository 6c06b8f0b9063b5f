#!/usr/bin/env python
"""Headline benchmark: H36M-shape training throughput per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures the judged metric "H36M train images/sec/chip" on the flagship
config (ResNet-50 integral 3D @ 256x256, bf16, fused on-device target
generation) with device-resident synthetic batches — the steady-state
compute rate a double-buffered input pipeline has to keep up with.

vs_baseline: the reference publishes NO throughput numbers (BASELINE.md);
the driver's target is >=4x a contemporary-GPU reference run, estimated at
~150 img/s for simple-baselines-era ResNet-50@256 training. vs_baseline is
therefore value / 150.0 — i.e. >=4.0 meets the stated target.
"""

from __future__ import annotations

import json
import time

import numpy as np

REFERENCE_GPU_IMG_S = 150.0     # estimate; reference publishes none


def main():
    import jax
    import jax.numpy as jnp
    from epipolarpose_tpu.config import load_config
    import pathlib

    root = pathlib.Path(__file__).resolve().parent
    cfg = load_config(root / "experiments" / "h36m"
                      / "train_fs_r50_256_integral.yaml")

    from epipolarpose_tpu.core import create_train_state, make_train_step
    from epipolarpose_tpu.models import get_model

    batch_size = 128
    model = get_model(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0),
                               steps_per_epoch=1000)
    step = make_train_step(cfg, model, donate=True)

    rng = np.random.default_rng(0)
    J = int(cfg.MODEL.NUM_JOINTS)
    batch = {
        "input": jax.device_put(
            rng.uniform(0, 1, (batch_size, 256, 256, 3)).astype(np.float32)),
        "joints": jax.device_put(
            rng.uniform(20, 236, (batch_size, J, 2)).astype(np.float32)),
        "joints_vis": jax.device_put(np.ones((batch_size, J), np.float32)),
        "joints_3d": jax.device_put(
            rng.uniform(-400, 400, (batch_size, J, 3)).astype(np.float32)),
        "center": jax.device_put(np.full((batch_size, 2), 128, np.float32)),
        "scale": jax.device_put(np.full((batch_size, 2), 1.28, np.float32)),
    }

    # Scan K steps inside one jit: measures pure device throughput, free
    # of the per-step host dispatch RTT (~25ms through the axon tunnel).
    # The jitted step inlines when traced inside the scan body; donation
    # warnings there are harmless.
    K = 20

    @jax.jit
    def run_k(state):
        def body(st, _):
            st, m = step(st, batch)
            return st, m["loss"]
        return jax.lax.scan(body, state, None, length=K)

    state, losses = run_k(state)
    _ = float(losses[-1])               # compile + sync
    iters = 5
    t0 = time.time()
    for _ in range(iters):
        state, losses = run_k(state)
    _ = float(losses[-1])               # one sync at the end
    dt = (time.time() - t0) / (iters * K)
    img_s = batch_size / dt

    print(json.dumps({
        "metric": "h36m_train_images_per_sec_per_chip",
        "value": round(img_s, 1),
        "unit": "img/s",
        "vs_baseline": round(img_s / REFERENCE_GPU_IMG_S, 2),
    }))


if __name__ == "__main__":
    main()
