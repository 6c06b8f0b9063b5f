"""Run directories + logging + metric writers.

Reference ``create_logger`` (lib/utils/utils.py [H]): timestamped output dir
``output/<dataset>/<model>/<cfg_name>/`` + log dir + tensorboard writer.
"""

from __future__ import annotations

import logging
import os
import time
from pathlib import Path


def create_logger(cfg, cfg_name: str, phase: str = "train"):
    """Returns (logger, final_output_dir, tb_log_dir)."""
    root = Path(cfg.OUTPUT_DIR)
    dataset = cfg.DATASET.DATASET
    from epipolarpose_tpu.config import get_model_name
    _, full_name = get_model_name(cfg)
    cfg_name = os.path.basename(cfg_name).split(".")[0]

    final_output_dir = root / dataset / full_name / cfg_name
    final_output_dir.mkdir(parents=True, exist_ok=True)

    time_str = time.strftime("%Y-%m-%d-%H-%M")
    log_file = final_output_dir / f"{cfg_name}_{time_str}_{phase}.log"
    logging.basicConfig(
        filename=str(log_file),
        format="%(asctime)-15s %(message)s",
        level=logging.INFO,
        force=True)
    logger = logging.getLogger()
    console = logging.StreamHandler()
    console.setFormatter(logging.Formatter("%(asctime)-15s %(message)s"))
    logger.addHandler(console)

    tb_log_dir = (Path(cfg.LOG_DIR) / dataset /
                  f"{cfg_name}_{time_str}")
    tb_log_dir.mkdir(parents=True, exist_ok=True)
    return logger, str(final_output_dir), str(tb_log_dir)


def create_metric_writer(tb_log_dir: str):
    """CLU metric writer -> tensorboard (SURVEY §5 observability row);
    returns None when tensorboard isn't usable."""
    try:
        from clu import metric_writers
        return metric_writers.create_default_writer(tb_log_dir)
    except Exception:
        return None
