"""Mesh construction + sharding helpers (data-parallel first)."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(cfg=None, num_devices: int | None = None) -> Mesh:
    """Build a (data, model) mesh from config / device count.

    cfg.TPU.MESH.DATA == -1 means "all devices on the data axis".
    """
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    model = 1
    if cfg is not None:
        model = max(1, int(cfg.TPU.MESH.MODEL))
        data = int(cfg.TPU.MESH.DATA)
        if data and data > 0:
            devices = devices[:data * model]
    data = len(devices) // model
    arr = np.asarray(devices[:data * model]).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def image_sharding(mesh: Mesh) -> NamedSharding:
    """Batch over ``data`` + SPATIAL partitioning of image rows over
    ``model`` when that axis is >1 (the SP analogue for this CNN — SURVEY
    §2.C: activation sharding for the 384² configs; GSPMD inserts the conv
    halo exchanges automatically, verified loss-identical in tests)."""
    if mesh.shape["model"] > 1:
        return NamedSharding(mesh, P("data", "model", None, None))
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_shardings(mesh: Mesh, batch_keys) -> dict:
    """Per-key shardings for a batch dict: images get spatial sharding."""
    out = {}
    for k in batch_keys:
        out[k] = image_sharding(mesh) if k == "input" \
            else batch_sharding(mesh)
    return out


def shard_batch(batch: dict, mesh: Mesh, batch_axis: int = 0) -> dict:
    """Place a host batch dict onto the mesh, sharded over ``data`` (and
    image rows over ``model`` when the axis is in use).

    ``batch_axis=1`` handles K-stacked SUPER-batches (fused-step training,
    ``data.pipeline.stack_batches``): the leading scan axis stays
    unsharded, the per-step batch axis shards over ``data``.
    """
    lead = (None,) * batch_axis

    def put(path, x):
        x = np.asarray(x)
        last = path[-1] if path else None
        # DictKey has .key; GetAttrKey (flax.struct fields) has .name
        key = getattr(last, "key", getattr(last, "name", None))
        if x.ndim > batch_axis and \
                x.shape[batch_axis] % mesh.shape["data"] == 0:
            nd = x.ndim - batch_axis          # dims from the batch axis on
            if key == "input" and mesh.shape["model"] > 1:
                if nd == 4 and \
                        x.shape[batch_axis + 1] % mesh.shape["model"] == 0:
                    return jax.device_put(x, NamedSharding(
                        mesh, P(*lead, "data", "model", None, None)))
                if nd == 5 and \
                        x.shape[batch_axis + 2] % mesh.shape["model"] == 0:
                    # multi-view batches: (G, V, H, W, 3) — rows over model
                    return jax.device_put(x, NamedSharding(
                        mesh, P(*lead, "data", None, "model", None, None)))
            return jax.device_put(x, NamedSharding(mesh, P(*lead, "data")))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map_with_path(put, batch)


def shard_batch_local(batch: dict, mesh: Mesh,
                      process_count: int | None = None,
                      batch_axis: int = 0) -> dict:
    """Assemble a GLOBAL device batch from this host's LOCAL shard (pod DP).

    Counterpart of the loaders' ``process_index/process_count`` slicing
    (SURVEY §2.C "data sharded per host"): every host decoded only
    global_batch/P samples; ``jax.make_array_from_process_local_data``
    stitches the per-process shards into one global jax.Array laid out over
    the mesh's ``data`` axis — no cross-host data movement, each shard is
    already on the host that owns those mesh devices. Falls back to
    :func:`shard_batch` semantics when single-process.
    """
    pc = process_count if process_count is not None else jax.process_count()
    if pc <= 1:
        return shard_batch(batch, mesh, batch_axis=batch_axis)
    lead = (None,) * batch_axis

    def put(path, x):
        x = np.asarray(x)
        if x.ndim > batch_axis:
            if (x.shape[batch_axis] * pc) % mesh.shape["data"] != 0:
                # treating per-sample leaves as "replicated" here would
                # hand SPMD DIFFERENT per-host arrays as one replicated
                # operand — silent garbage, not a fallback
                raise ValueError(
                    f"global batch {x.shape[batch_axis] * pc} (leaf "
                    f"{path}) not divisible by data axis "
                    f"{mesh.shape['data']}")
            sh = NamedSharding(mesh, P(*lead, "data"))
            gshape = (x.shape[:batch_axis]
                      + (x.shape[batch_axis] * pc,)
                      + x.shape[batch_axis + 1:])
            return jax.make_array_from_process_local_data(sh, x, gshape)
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, P()), x, x.shape)

    return jax.tree_util.tree_map_with_path(put, batch)


def pod_sync(name: str, timeout_s: float = 600.0) -> None:
    """Align all pod processes at a named coordination-service barrier.

    XLA:CPU's Gloo communicator init exchanges rendezvous keys through the
    distributed KV store with a HARD ~30 s timeout per get, so if one
    process reaches a program's first collective >30 s before its peer
    (cold-vs-warm compile cache, loader skew, host contention) the early
    one dies with ``Gloo context initialization failed: DEADLINE_EXCEEDED
    GetKeyValue()`` (measured r5, tests/test_multihost.py under CPU load).
    TPU pods don't need this (ICI rendezvous rides the same coordination
    service with configurable deadlines), but CPU-backend pod tests and
    heterogeneous-start pods do: call it right before the first execution
    of each freshly-compiled collective program. The barrier uses the
    coordination service directly — no collectives, so the timeout is
    whatever you pass, not Gloo's 30 s. No-op when not distributed.
    """
    import jax

    from jax._src import distributed

    client = getattr(distributed.global_state, "client", None)
    if client is None or jax.process_count() <= 1:
        return
    client.wait_at_barrier(name, timeout_in_ms=int(timeout_s * 1000))
