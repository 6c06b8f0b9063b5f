"""Core runtime: config-driven train/validate loops, steps, checkpoints."""

from epipolarpose_tpu.core.function import (  # noqa: F401
    AverageMeter,
    train,
    validate,
)
from epipolarpose_tpu.core.steps import (  # noqa: F401
    make_eval_step,
    make_train_step,
    normalize_images,
)
from epipolarpose_tpu.core.train_state import (  # noqa: F401
    TrainState,
    create_train_state,
    make_lr_schedule,
    make_optimizer,
)
from epipolarpose_tpu.core.checkpoint import (  # noqa: F401
    CheckpointManager,
    load_model_variables,
    load_variables,
    resolve_checkpoint_path,
)
from epipolarpose_tpu.core.logger import (  # noqa: F401
    create_logger,
    create_metric_writer,
)
