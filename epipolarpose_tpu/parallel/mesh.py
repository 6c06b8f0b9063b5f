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


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch dict onto the mesh, sharded over ``data``."""
    sh = batch_sharding(mesh)

    def put(x):
        x = np.asarray(x)
        spec = P("data") if x.ndim >= 1 and x.shape[0] % mesh.shape["data"] \
            == 0 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, batch)
