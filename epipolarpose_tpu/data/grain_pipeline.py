"""grain-backed input pipeline (SURVEY §2.C TPU-native plan).

The reference feeds GPUs with ``torch.utils.data.DataLoader(num_workers=N,
pin_memory=True)`` — multi-PROCESS host decode. The framework's default
equivalent is the thread-pool + C++ fastloader (faster on few-core hosts,
one native call per batch); this module is the multi-process alternative
the survey named: `grain` worker processes each decode/augment single
samples, grain batches them, and the result feeds the same
``device_prefetch``. Prefer it on many-core hosts where Python-side work
(zip reads, non-JPEG sources) would serialize on the GIL.

Select with ``TPU.LOADER: grain`` (default ``threads``) or call
:func:`grain_epoch_loader` directly.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np


class _SampleSource:
    """grain RandomAccessDataSource view of a JointsDataset: one decoded,
    augmented sample per index (the per-sample path — grain owns the
    parallelism, so the dataset's own pool/native batching is bypassed)."""

    def __init__(self, dataset, seed: int):
        self._ds = dataset
        self._seed = seed

    def __len__(self) -> int:
        return len(self._ds.records)

    def __getitem__(self, idx: int) -> dict:
        return self._ds._load_one(int(idx), self._seed * 1_000_003
                                  + int(idx))

    def __getstate__(self):
        # grain worker processes pickle the source; the dataset drops its
        # thread pool in __getstate__ (see JointsDataset)
        return self.__dict__

    def __repr__(self):  # grain logs sources; keep it short
        return f"_SampleSource({type(self._ds).__name__}, n={len(self)})"


def grain_epoch_loader(dataset, batch_size: int, epoch: int,
                       is_train: bool = True, worker_count: int = 0,
                       drop_remainder: bool | None = None) -> Iterator[dict]:
    """One epoch of host batches through grain's multi-process DataLoader.

    ``worker_count=0`` runs in-process (tests / few-core hosts);
    ``worker_count>0`` forks worker processes like the reference's
    DataLoader. Batches are dicts of stacked numpy arrays with the same
    keys as ``JointsDataset.get_batch``.

    ``drop_remainder`` defaults to ``is_train`` (the reference's train
    loader drops the tail, eval must see every sample); a short eval tail
    is padded by repeating its last sample so batch shapes stay static
    under jit — identical to ``JointsDataset.batches``, whose padding the
    eval loop trims by record count.
    """
    import grain.python as gp

    if drop_remainder is None:
        drop_remainder = bool(is_train)
    source = _SampleSource(dataset, seed=epoch)
    sampler = gp.IndexSampler(
        num_records=len(source),
        shuffle=bool(is_train),
        seed=epoch,
        num_epochs=1,
        shard_options=gp.ShardOptions(shard_index=0, shard_count=1,
                                      drop_remainder=drop_remainder),
    )
    loader = gp.DataLoader(
        data_source=source,
        sampler=sampler,
        operations=[gp.Batch(batch_size=batch_size,
                             drop_remainder=drop_remainder)],
        worker_count=worker_count,
    )
    for batch in loader:
        # grain stacks dict-of-array samples into dict-of-batched-arrays
        out = {k: np.asarray(v) for k, v in batch.items()}
        short = next(iter(out.values())).shape[0]
        if short < batch_size:                  # pad the eval remainder
            out = {k: np.concatenate(
                [v, np.repeat(v[-1:], batch_size - short, axis=0)])
                for k, v in out.items()}
        yield out
