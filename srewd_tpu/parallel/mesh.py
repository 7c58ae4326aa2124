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


def param_placement(tree, mesh: Mesh, min_shard_dim: int | None = None):
    """Per-leaf NamedSharding pytree implementing lazy tensor parallelism.

    With min_shard_dim=None (or a mesh whose 'model' axis is 1) every leaf is
    replicated — the plain DP placement. Otherwise any leaf whose LAST axis
    is >= min_shard_dim and divisible by the 'model' axis size is sharded on
    that axis. For NHWC conv kernels [kh, kw, cin, cout] and their [cout]
    biases this is column-parallel TP: each device holds 1/model of the
    output channels, GSPMD propagates the sharding through the network and
    inserts the all-gathers/reduce-scatters (over ICI) where layers
    consume full-channel activations — no hand-written collectives. The same
    shape rule placed over the optax state shards the Adam mu/nu moments
    identically (they mirror param shapes), so optimizer memory scales down
    with the axis too.
    """
    msize = dict(mesh.shape).get("model", 1)

    def spec_for(x):
        shape = getattr(x, "shape", ())
        if (
            min_shard_dim is not None
            and msize > 1
            and len(shape) >= 1
            and shape[-1] >= min_shard_dim
            and shape[-1] % msize == 0
        ):
            return NamedSharding(mesh, P(*([None] * (len(shape) - 1)), "model"))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec_for, tree)
