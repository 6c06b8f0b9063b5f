#!/usr/bin/env python
"""Serialize the pose model for serving: jax.export -> StableHLO artifact.

    python tools/export_model.py --cfg experiments/h36m/valid_r50_256_integral.yaml \
        [--model-file <ckpt>] [--batch-size 8 | --batch-size -1] --out model.jaxexp

The reference has no serving story (research checkpoints only); a
TPU-native framework needs one: the exported artifact embeds weights +
StableHLO of the full inference computation (normalize -> forward ->
soft-argmax decode), is loadable with `jax.export.deserialize` in a
process with no framework code, and runs on any jax backend.
``--batch-size -1`` exports with a SYMBOLIC batch dimension so one
artifact serves any batch size.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_predict_fn(cfg, state):
    """Closure of the full inference computation over baked-in weights.

    Input: images (N, H, W, 3) float32 in [0, 1].
    Output: gaussian -> heatmaps (N, h, w, J); integral -> (N, J, 3)
    normalized coords in [-0.5, 0.5).
    """
    import jax.numpy as jnp
    from epipolarpose_tpu.core.steps import normalize_images
    from epipolarpose_tpu.models import get_model
    from epipolarpose_tpu.ops import softmax_integral

    model = get_model(cfg, is_train=False)
    target_type = cfg.MODEL.EXTRA.TARGET_TYPE
    num_joints = int(cfg.MODEL.NUM_JOINTS)
    depth_dim = int(cfg.MODEL.EXTRA.DEPTH_DIM)
    params, stats = state

    def predict(images):
        out = model.apply({"params": params, "batch_stats": stats},
                          normalize_images(images), train=False)
        if target_type == "gaussian":
            return out.astype(jnp.float32)
        return softmax_integral(out, num_joints, depth_dim)

    return predict


def export_model(cfg, state, batch_size: int = 8):
    import jax
    import jax.numpy as jnp
    from jax import export as jexp

    predict = build_predict_fn(cfg, state)
    W, H = (int(v) for v in cfg.MODEL.IMAGE_SIZE)
    if batch_size < 0:
        b, = jexp.symbolic_shape("b")
        spec = jax.ShapeDtypeStruct((b, H, W, 3), jnp.float32)
    else:
        spec = jax.ShapeDtypeStruct((batch_size, H, W, 3), jnp.float32)
    return jexp.export(jax.jit(predict))(spec)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", required=True)
    p.add_argument("--model-file", default=None)
    p.add_argument("--batch-size", type=int, default=8,
                   help="-1 exports a symbolic (any) batch dimension")
    p.add_argument("--out", default="model.jaxexp")
    args = p.parse_args()

    from epipolarpose_tpu.config import config, update_config
    update_config(args.cfg)

    import jax
    from epipolarpose_tpu.core import create_train_state
    from epipolarpose_tpu.models import get_model

    model = get_model(config, is_train=False)
    st = create_train_state(config, model, jax.random.PRNGKey(0), 1)
    params, stats = st.params, st.batch_stats
    mf = args.model_file or config.TEST.MODEL_FILE
    if mf:
        from epipolarpose_tpu.core import load_model_variables
        v = load_model_variables(mf, {"params": params,
                                      "batch_stats": stats},
                                 int(config.MODEL.EXTRA.NUM_LAYERS))
        params, stats = v["params"], v["batch_stats"]

    exported = export_model(config, (params, stats), args.batch_size)
    data = exported.serialize()
    with open(args.out, "wb") as f:
        f.write(data)
    print(f"wrote {args.out}: {len(data) / 1e6:.1f} MB, "
          f"in {exported.in_avals}, out {exported.out_avals}, "
          f"platforms {exported.platforms}")


if __name__ == "__main__":
    main()
