"""AOT sampler export: one self-contained compiled-program artifact.

The reference's only deployment story is re-running sample.py next to the
full source tree (reference sample.py:16-60 rebuilds config -> data ->
model -> weights every run). For production serving this module uses
`jax.export` to serialize the ENTIRE sampling program — the T-step
reverse-diffusion `lax.scan`, the trained weights baked in as constants,
the train-time Kelvin scalers, and whatever kernel routing (paired level,
flash attention) the tracing platform selected — into ONE artifact
(StableHLO + constants). A serving host deserializes it and super-resolves
with zero model code, zero config, zero retrace:

    fn = load_sampler("sr3.srexport")
    sr_kelvin = fn(lr_kelvin, months, seed)      # [b,lh,lw,C] -> [b,hh,hw,C]

The batch dimension is exported SYMBOLICALLY ("b") by default, so one
artifact serves any request size (the fixed-shape packing of
serving/service.py remains the throughput-optimal way to feed it).

Determinism: the chain noise derives only from (seed, batch shape) — a
fixed seed reproduces the exact fields on the same platform/jax version.

Artifact compatibility is jax.export's: same-or-newer jax, same platform
kind (export on the platform you serve on, or pass platforms=["tpu"] to
cross-compile from a CPU host — flash/paired routing then follows the
TRACING platform's gates, so prefer exporting on the target platform).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax import export as jexport


def _bake_scaler(scaler) -> Optional[tuple]:
    """MonthlyScalerSet -> (mean[13,...], std[13,...]) jnp constants."""
    if scaler is None or getattr(scaler, "identity", True):
        return None
    return jnp.asarray(scaler.mean), jnp.asarray(scaler.std)


def export_sampler(
    model,
    params: dict,
    schedule,
    lr_shape: Sequence[int],
    *,
    sampler_kwargs: Optional[dict] = None,
    lr_scaler=None,
    hr_scaler=None,
    symbolic_batch: bool = True,
    batch_size: int = 8,
    platforms: Optional[Sequence[str]] = None,
) -> "jexport.Exported":
    """Trace + export the full sampling program with weights baked in.

    lr_shape: [lh, lw, C] of one LR field (the HR size comes from the
    model's diffusion config, as in generate_sr). lr_scaler/hr_scaler are
    MonthlyScalerSet instances for the Kelvin boundary (None -> the
    artifact works in normalized space and ignores `months`).

    symbolic_batch exports serve any batch size, with one hard ceiling:
    the chunked (non-flash) attention path sizes its memory slab for
    SREWD_EXPORT_MAX_BATCH (default 16) at trace time — serving a larger
    batch on that path scales the slab past the 64 MB device budget. Set
    the env var at export time if a bigger serving batch is needed
    (models/blocks._chunked_attention).
    """
    lh, lw, c = (int(v) for v in lr_shape)
    kwargs = dict(sampler_kwargs or {})
    if kwargs.get("keep_every") is not None:
        raise ValueError("export_sampler does not support keep_every frames")
    lr_stats = _bake_scaler(lr_scaler)
    hr_stats = _bake_scaler(hr_scaler)
    # close over a snapshot: the caller may hand us a live trainer tree
    # whose buffers a later donated train step would invalidate
    params = jax.tree.map(jnp.asarray, params)

    def fn(lr, months, seed):
        if lr_stats is not None:
            mean, std = lr_stats
            lr = (lr - mean[months]) / std[months]
        key = jax.random.key(seed)
        sr = model.generate_sr(params, {"LR": lr}, key, schedule, **kwargs)
        if hr_stats is not None:
            mean, std = hr_stats
            sr = std[months] * sr + mean[months]
        return sr

    if symbolic_batch:
        (b,) = jexport.symbolic_shape("b")
    else:
        b = int(batch_size)
    specs = (
        jax.ShapeDtypeStruct((b, lh, lw, c), jnp.float32),
        jax.ShapeDtypeStruct((b,), jnp.int32),
        jax.ShapeDtypeStruct((), jnp.uint32),
    )
    kw = {}
    if platforms is not None:
        kw["platforms"] = tuple(platforms)
    # On TPU the flash-attention path lowers to a Mosaic custom call, which
    # jax.export rejects as non-hermetic by default. It IS portable across
    # same-generation TPUs (the kernel is serialized inside the call), so
    # allow exactly that target rather than failing the whole export.
    kw["disabled_checks"] = (
        jexport.DisabledSafetyCheck.custom_call("tpu_custom_call"),
    )
    return jexport.export(jax.jit(fn), **kw)(*specs)


def save_sampler(exported: "jexport.Exported", path: str) -> None:
    """Serialize an exported sampler to disk (one opaque binary blob)."""
    data = exported.serialize()
    with open(path, "wb") as f:
        f.write(bytes(data))


def load_sampler(path: str):
    """Deserialize an artifact -> fn(lr, months, seed) -> sr (jit-wrapped).

    Needs only jax — no srewd_tpu model code, config, or checkpoint.
    """
    with open(path, "rb") as f:
        data = f.read()
    exported = jexport.deserialize(bytearray(data))
    # one jit wrapper for the artifact's lifetime: re-wrapping per call
    # would discard the trace cache (the symbolic-batch program still
    # compiles once per distinct concrete batch size, as expected)
    call = jax.jit(exported.call)

    def fn(lr, months=None, seed=0):
        lr = jnp.asarray(lr, jnp.float32)
        if months is None:
            months = jnp.zeros((lr.shape[0],), jnp.int32)
        return call(lr, jnp.asarray(months, jnp.int32), jnp.uint32(seed))

    fn.exported = exported
    return fn
