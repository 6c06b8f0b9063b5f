"""Every shipped experiment YAML must trace/lower end-to-end.

Catches config-schema drift and sharding bugs in the big judged configs
(ResNet-152 @ 384², remat, 8-way DP) without paying their compile cost:
``jax.jit(...).lower()`` runs full tracing + SPMD partitioning, not codegen.
"""

import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from epipolarpose_tpu.config import load_config
from epipolarpose_tpu.core import create_train_state, make_train_step
from epipolarpose_tpu.models import get_model
from epipolarpose_tpu.parallel import batch_sharding, make_mesh

EXP = pathlib.Path(__file__).resolve().parents[1] / "experiments"

CONFIGS = [p for p in sorted(EXP.glob("*/*.yaml"))
           if "debug" not in str(p)]


@pytest.mark.parametrize("yaml_file", CONFIGS,
                         ids=lambda p: f"{p.parent.name}/{p.name}")
def test_train_step_lowers(yaml_file):
    cfg = load_config(yaml_file)
    if cfg.DATASET.LABEL_SOURCE == "triangulated":
        pytest.skip("SS configs lowered in test_self_supervised")
    mesh = make_mesh(cfg, num_devices=8)
    model = get_model(cfg)
    # abstract init: no real params materialized
    W, H = (int(v) for v in cfg.MODEL.IMAGE_SIZE)
    J = int(cfg.MODEL.NUM_JOINTS)
    bs = 8

    def init():
        return create_train_state(cfg, model, jax.random.PRNGKey(0), 100,
                                  image_size=(W, H))

    state_shape = jax.eval_shape(init)
    step = make_train_step(cfg, model, mesh=mesh, donate=False)
    batch = {
        "input": jax.ShapeDtypeStruct((bs, H, W, 3), jnp.float32),
        "joints": jax.ShapeDtypeStruct((bs, J, 2), jnp.float32),
        "joints_vis": jax.ShapeDtypeStruct((bs, J), jnp.float32),
        "joints_3d": jax.ShapeDtypeStruct((bs, J, 3), jnp.float32),
        "center": jax.ShapeDtypeStruct((bs, 2), jnp.float32),
        "scale": jax.ShapeDtypeStruct((bs, 2), jnp.float32),
    }
    lowered = step.lower(state_shape, batch)
    text = lowered.as_text()
    assert "sharding" in text        # SPMD annotations survived
    if cfg.TPU.REMAT:
        # remat shows up as checkpointed while/optimization-barrier regions
        assert ("checkpoint" in text) or ("opt-barrier" in text) or \
            ("OptimizationBarrier" in text) or ("optimization_barrier"
                                                in text)
