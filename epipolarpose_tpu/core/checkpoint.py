"""Checkpointing: orbax-backed latest/best/final retention.

Mirrors the reference artifacts (``save_checkpoint`` in lib/utils/utils.py
[H]): ``checkpoint.pth.tar`` (latest) -> step-numbered orbax checkpoints
with max_to_keep, ``model_best.pth.tar`` -> the best-metric checkpoint kept
via orbax best_fn, ``final_state.pth.tar`` -> a params-only save at the end.
Async saves keep the device busy (SURVEY §5 failure-recovery row).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3,
                 best_mode: str = "max"):
        """``best_mode``: 'max' for PCKh-style perf, 'min' for MPJPE —
        retention must match the dataset's metric direction or orbax keeps
        the worst checkpoints."""
        assert best_mode in ("max", "min"), best_mode
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        missing = -np.inf if best_mode == "max" else np.inf
        self._mngr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                best_fn=lambda m: float(m.get("perf", missing)),
                best_mode=best_mode,
                create=True,
            ),
        )

    def save(self, step: int, state, epoch: int, perf: float,
             is_best: bool | None = None, wait: bool = False):
        """Save model+optimizer+progress (reference checkpoint.pth.tar)."""
        payload = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": np.asarray(state.step),
            "epoch": np.asarray(epoch),
            "perf": np.asarray(perf),
        }
        self._mngr.save(step, args=ocp.args.StandardSave(payload),
                        metrics={"perf": float(perf)})
        if wait:
            self._mngr.wait_until_finished()

    def restore(self, state, step: int | None = None):
        """Restore into an existing state template (TRAIN.RESUME [H]).

        Returns (state, epoch) or (state, 0) when nothing to restore.
        """
        step = step if step is not None else self._mngr.latest_step()
        if step is None:
            return state, 0
        template = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": np.asarray(state.step),
            "epoch": np.asarray(0),
            "perf": np.asarray(0.0),
        }
        restored = self._mngr.restore(
            step, args=ocp.args.StandardRestore(template))
        state = state.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            step=jax.numpy.asarray(restored["step"]))
        return state, int(restored["epoch"]) + 1

    @property
    def best_step(self):
        return self._mngr.best_step()

    def save_final(self, state):
        """Params-only final save (reference final_state.pth.tar)."""
        path = os.path.join(self.directory, "final_state")
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, {"params": state.params,
                          "batch_stats": state.batch_stats}, force=True)
        ckptr.wait_until_finished()
        return path

    def wait(self):
        self._mngr.wait_until_finished()

    def close(self):
        self._mngr.close()
