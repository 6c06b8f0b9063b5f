"""Training state + optimizer/schedule factories.

Mirrors the reference's optimizer construction (``get_optimizer`` in
lib/utils/utils.py [H]: Adam/SGD from TRAIN.OPTIMIZER) and the MultiStepLR
schedule (TRAIN.LR_STEP epochs x TRAIN.LR_FACTOR), expressed as optax.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt,
            batch_stats=(new_batch_stats if new_batch_stats is not None
                         else self.batch_stats),
        )


def make_lr_schedule(cfg, steps_per_epoch: int) -> optax.Schedule:
    """MultiStepLR: LR * LR_FACTOR at each epoch in TRAIN.LR_STEP [H]."""
    base = float(cfg.TRAIN.LR)
    factor = float(cfg.TRAIN.LR_FACTOR)
    boundaries = {int(e) * steps_per_epoch: factor
                  for e in cfg.TRAIN.LR_STEP}
    return optax.piecewise_constant_schedule(base, boundaries)


def make_optimizer(cfg, steps_per_epoch: int) -> optax.GradientTransformation:
    sched = make_lr_schedule(cfg, steps_per_epoch)
    name = str(cfg.TRAIN.OPTIMIZER).lower()
    if name == "adam":
        return optax.adam(sched)
    if name == "sgd":
        # reference get_optimizer: optim.SGD(..., weight_decay=TRAIN.WD);
        # torch couples decay into the gradient BEFORE momentum, which is
        # optax's add_decayed_weights -> sgd ordering (adam has no decay
        # in the reference, matching optax.adam above)
        return optax.chain(
            optax.add_decayed_weights(float(cfg.TRAIN.WD)),
            optax.sgd(sched, momentum=float(cfg.TRAIN.MOMENTUM),
                      nesterov=bool(cfg.TRAIN.NESTEROV)))
    raise ValueError(f"unknown TRAIN.OPTIMIZER: {cfg.TRAIN.OPTIMIZER}")


def create_train_state(cfg, model, rng, steps_per_epoch: int = 1000,
                       image_size=None) -> TrainState:
    from epipolarpose_tpu.models import init_pose_net
    image_size = image_size or tuple(cfg.MODEL.IMAGE_SIZE)
    params, stats = init_pose_net(model, rng, image_size)
    tx = make_optimizer(cfg, steps_per_epoch)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=stats,
        opt_state=tx.init(params),
        tx=tx,
    )
