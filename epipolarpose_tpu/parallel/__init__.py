"""Parallelism: device meshes and sharded train-step construction.

The reference's only parallelism is single-process ``nn.DataParallel``
(SURVEY.md §2.C). TPU-native replacement: a ``jax.sharding.Mesh`` with a
``data`` axis (and an optional ``model`` axis for channel-sharding the big
configs); batches are sharded over ``data``, parameters replicated, and XLA
inserts the gradient ``psum`` over ICI automatically from the sharding
annotations. Multi-host (pod) runs reuse the same code: ``jax.distributed``
initialization + per-host data feeding (SURVEY §2.C "TPU-native plan").
"""

from epipolarpose_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    pod_sync,
    replicated,
    shard_batch,
    shard_batch_local,
)
