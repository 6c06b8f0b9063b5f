"""Checkpointing: orbax-backed latest/best/final retention.

Mirrors the reference artifacts (``save_checkpoint`` in lib/utils/utils.py
[H]): ``checkpoint.pth.tar`` (latest) -> step-numbered orbax checkpoints
with max_to_keep, ``model_best.pth.tar`` -> the best-metric checkpoint kept
in a separate ``best/`` manager, ``final_state.pth.tar`` -> a params-only
save at the end. Async saves keep the device busy (SURVEY §5
failure-recovery row).

Latest and best are SEPARATE orbax managers on purpose: combining
``best_fn`` with ``max_to_keep`` in one manager makes orbax retain by
metric quality, which garbage-collects the most recent save whenever the
metric plateaus — and then ``TRAIN.RESUME`` would silently roll training
back to an old best step.
"""

from __future__ import annotations

import os

import jax
import numpy as np
import orbax.checkpoint as ocp


def resolve_checkpoint_path(path: str) -> str:
    """Resolve a user-facing checkpoint path to an orbax payload dir.

    Accepts any of (mirroring the reference's single ``.pth.tar`` file
    argument, which has no sub-structure to navigate):

    - a payload dir itself (``.../final_state`` or ``.../<step>/default``)
    - a step dir (``.../checkpoints/<step>``) -> its ``default`` item
    - a manager root (``.../checkpoints`` or ``.../checkpoints/best``)
      -> the latest step under it
    - the virtual names ``.../checkpoints/latest`` (the root's newest
      step) for symmetry with ``best``
    """
    p = os.path.abspath(path)
    if os.path.basename(p) == "latest" and not os.path.isdir(p):
        p = os.path.dirname(p)
    if os.path.isfile(os.path.join(p, "_METADATA")):
        return p                          # payload dir
    d = os.path.join(p, "default")
    if os.path.isfile(os.path.join(d, "_METADATA")):
        return d                          # step dir
    steps = [int(n) for n in os.listdir(p) if n.isdigit()] \
        if os.path.isdir(p) else []
    if steps:                             # manager root -> newest step
        return resolve_checkpoint_path(os.path.join(p, str(max(steps))))
    raise FileNotFoundError(f"no orbax checkpoint under {path!r}")


def restore_raw(path: str) -> dict:
    """Untyped restore of any orbax layout this repo writes (see
    :func:`resolve_checkpoint_path`): the full payload dict, no
    template validation — for callers that merge/filter themselves
    (e.g. the 2D->3D pretrained merge, which must tolerate
    shape-mismatched heads)."""
    resolved = resolve_checkpoint_path(path)
    return ocp.StandardCheckpointer().restore(resolved)


def load_variables(path: str, template: dict) -> dict:
    """Load model variables from ANY checkpoint layout this repo writes.

    ``template`` is a pytree like ``{'params': ..., 'batch_stats': ...}``;
    only its top-level keys are read from the (possibly larger
    latest/best training payload, which also carries opt_state/step/
    epoch/perf), and leaves are cast to the template's dtypes.
    """
    resolved = path
    full = restore_raw(path)              # untyped: tolerates extra keys
    missing = [k for k in template if k not in full]
    if missing:
        raise KeyError(f"checkpoint {resolved} lacks {missing}; "
                       f"has {sorted(full)}")
    out = {}
    for key, sub in template.items():
        a, ta = jax.tree_util.tree_flatten(full[key])
        b, tb = jax.tree_util.tree_flatten(sub)
        if ta != tb:
            raise ValueError(
                f"checkpoint {resolved} '{key}' tree differs from the "
                f"model's: {ta} vs {tb}")
        # read dtypes WITHOUT np.asarray(template): the template is often
        # the live device-resident model (state.params) and materializing
        # it to host copies ~hundreds of MB over a high-RTT link per load
        out[key] = jax.tree_util.tree_unflatten(
            tb, [np.asarray(x, dtype=getattr(t, "dtype", None)
                            or np.asarray(t).dtype)
                 for x, t in zip(a, b)])
    return out


def load_model_variables(path: str, template,
                         num_layers: int) -> dict:
    """Load ``{'params', 'batch_stats'}`` from EITHER checkpoint format
    this repo reads: a reference-format torch ``.pth``/``.pth.tar`` file
    (reference TEST.MODEL_FILE semantics) or any orbax layout accepted by
    :func:`resolve_checkpoint_path`. The single call site for the suffix
    dispatch previously copy-pasted into every CLI.

    ``template``: a pytree (strict tree-match + dtype cast), a ZERO-ARG
    CALLABLE returning one (built lazily — the torch branch never needs
    it, so e.g. load_teacher skips a throwaway device init), or ``None``
    for an untyped restore the caller merges/filters itself (the 2D->3D
    pretrained merge must tolerate shape-mismatched heads)."""
    if str(path).endswith((".pth", ".pth.tar")):
        from epipolarpose_tpu.models import load_torch_checkpoint
        return load_torch_checkpoint(str(path), num_layers)
    if template is None:
        return restore_raw(str(path))
    if callable(template):
        template = template()
    return load_variables(str(path), template)


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3,
                 best_mode: str = "max"):
        """``best_mode``: 'max' for PCKh-style perf, 'min' for MPJPE —
        the best/ manager must match the dataset's metric direction."""
        assert best_mode in ("max", "min"), best_mode
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._best_mode = best_mode
        self._best_perf: float | None = None
        # latest: recency-only retention (resume safety)
        self._mngr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True),
        )
        # best: only improved saves go in, so latest == best with 1 kept
        self._best = ocp.CheckpointManager(
            os.path.join(self.directory, "best"),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=1, create=True),
        )
        prev = self._best.latest_step()
        if prev is not None:
            self._best_perf = self._read_best_perf(prev)

    def _read_best_perf(self, step: int) -> float | None:
        """Recover the best checkpoint's perf on resume. Metadata first;
        if absent/unreadable, fall back to the 'perf' leaf saved INSIDE
        the best payload itself — returning None here would make the next
        save overwrite best/ with a possibly worse checkpoint."""
        try:
            m = self._best.metadata(step)
            perf = (m.custom_metadata or {}).get("perf")
            if perf is not None:
                return float(perf)
        except Exception:
            pass
        try:
            # untyped full restore (once, on resume only): the payload
            # always carries its own 'perf' leaf (_payload)
            restored = self._best.restore(step)
            return float(np.asarray(restored["perf"]))
        except Exception:
            return None

    def _payload(self, state, epoch: int, perf: float):
        return {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": np.asarray(state.step),
            "epoch": np.asarray(epoch),
            "perf": np.asarray(perf),
        }

    def _improved(self, perf: float) -> bool:
        if self._best_perf is None or not np.isfinite(self._best_perf):
            return True
        return perf > self._best_perf if self._best_mode == "max" \
            else perf < self._best_perf

    def save(self, step: int, state, epoch: int, perf: float,
             is_best: bool | None = None, wait: bool = False):
        """Save model+optimizer+progress (reference checkpoint.pth.tar);
        additionally snapshot to best/ when the metric improved
        (reference model_best.pth.tar)."""
        payload = self._payload(state, epoch, perf)
        self._mngr.save(step, args=ocp.args.StandardSave(payload),
                        metrics={"perf": float(perf)})
        improved = self._improved(perf) if is_best is None else is_best
        if improved:
            self._best_perf = float(perf)
            self._best.save(step, args=ocp.args.StandardSave(payload),
                            custom_metadata={"perf": float(perf)})
        if wait:
            self.wait()

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
        return self._best.latest_step()

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
        self._best.wait_until_finished()

    def close(self):
        self._mngr.close()
        self._best.close()
