"""Optional grain-backed input pipeline (multiprocess host loading).

The BASELINE north-star calls for a grain/tf.data on-host pipeline; this
module provides the grain backend as an alternative to DataHandler's
in-process batching (native C++ reads + background prefetch thread). Use it
when the host has cores to spare: grain's worker processes overlap npy
decode + normalization across CPUs and shard per JAX process.

    from srewd_tpu.data.grain_pipeline import grain_batches
    for batch in grain_batches(dh, split="train", epoch=0, worker_count=4):
        trainer.train_on_batch(batch)

Batches match DataHandler.assemble exactly: {"HR","LR","months"} NHWC
float32, normalized, drop_last, per-epoch shuffle keyed by (seed, epoch).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np


class _SampleSource:
    """grain RandomAccessDataSource over a DataHandler's timestamp index.

    Delegates to DataHandler.assemble so every batching semantic
    (normalization, variable concat, lead_time/delays offsets) stays
    identical to the in-process pipeline by construction.
    """

    def __init__(self, handler, timestamps: np.ndarray):
        self._h = handler
        self._ts = timestamps

    def __len__(self) -> int:
        return len(self._ts)

    def __getitem__(self, idx: int) -> dict:
        one = self._h.assemble(self._ts[idx : idx + 1])
        return {
            "HR": one["HR"][0],
            "LR": one["LR"][0],
            "months": one["months"][0],
        }


def grain_batches(
    handler,
    split: str = "train",
    epoch: int = 0,
    batch_size: int | None = None,
    worker_count: int = 0,
    shard_by_process: bool = True,
) -> Iterator[dict]:
    """Yield batches through grain's DataLoader (worker processes)."""
    import grain.python as grain

    train = split == "train"
    ts = handler.train_timestamps if train else handler.val_timestamps
    bs = batch_size or (handler.train_batch_size if train else handler.val_batch_size)

    # NB: DataHandler already stripes timestamps per process when
    # process_count > 1; only shard here if it did not.
    shard = (
        grain.ShardByJaxProcess(drop_remainder=True)
        if shard_by_process and handler.process_count == 1
        else grain.NoSharding()
    )
    sampler = grain.IndexSampler(
        num_records=len(ts),
        shard_options=shard,
        shuffle=train and handler.shuffle,
        seed=handler.seed + 7919 * epoch,
        num_epochs=1,
    )
    loader = grain.DataLoader(
        data_source=_SampleSource(handler, ts),
        sampler=sampler,
        operations=[grain.Batch(bs, drop_remainder=True)],
        worker_count=worker_count,
    )
    yield from loader
