#!/usr/bin/env python
"""Export a trained checkpoint as a reference-format ``.pth.tar``.

    python tools/export_torch.py --cfg experiments/h36m/valid_r50_256_integral.yaml \
        --model-file output/.../latest --out model.pth.tar

The inverse of the ``.pth.tar -> flax`` import path: weights trained with
this framework load into the reference's PyTorch ``PoseResNet``
(``lib/models/pose_resnet.py`` per SURVEY.md §2.A) with ``strict=True``,
so a reference user can round-trip in both directions. Kernel layout and
ConvTranspose flip conventions are inverted in
``epipolarpose_tpu.models.torch_convert.export_state_dict`` and pinned by
a torch-oracle forward-parity test (tests/test_models.py).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--cfg", required=True)
    p.add_argument("--model-file", required=True,
                   help="orbax checkpoint dir (or a .pth.tar to re-save)")
    p.add_argument("--out", required=True, help="output .pth.tar path")
    args = p.parse_args()

    from epipolarpose_tpu.config import load_config
    from epipolarpose_tpu.core import load_model_variables
    from epipolarpose_tpu.models import save_torch_checkpoint

    cfg = load_config(args.cfg)

    def template():
        # built lazily: the .pth re-save branch never pays a model init
        import jax
        from epipolarpose_tpu.core import create_train_state
        from epipolarpose_tpu.models import get_model
        model = get_model(cfg, is_train=False)
        state = create_train_state(cfg, model, jax.random.PRNGKey(0), 1)
        return {"params": state.params, "batch_stats": state.batch_stats}

    variables = load_model_variables(args.model_file, template,
                                     int(cfg.MODEL.EXTRA.NUM_LAYERS))
    save_torch_checkpoint(args.out, variables)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
