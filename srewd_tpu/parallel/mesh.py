"""Device mesh + sharding rules for SPMD data parallelism.

The reference's only parallelism is single-process nn.DataParallel
(networks.py:166-168, SURVEY.md §2.8). The TPU-native equivalent: a
jax.sharding.Mesh over all devices with the global batch sharded on the
"data" axis and parameters replicated; XLA GSPMD inserts the psum for
gradient reduction over ICI. Multi-host DCN scaling falls out of the same
program via jax.distributed + per-host data sharding
(DataHandler.process_index/process_count).

The mesh is built 2-D ("data", "model") with model=1 by default so tensor/
sequence-parallel shardings can be layered on without re-plumbing; these
models (tens of M params) need only DP for capability parity.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: int | None = None,
    model_parallel: int = 1,
    axis_names: tuple[str, str] = ("data", "model"),
) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    grid = np.asarray(devices[:n]).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis sharded over 'data'; everything else replicated."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """device_put a host batch dict with the batch axis sharded on 'data'."""
    sh = batch_sharding(mesh)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}
