"""Pallas TPU attention: row-block exact softmax with K/V resident in VMEM.

Built for the HF-guided cross-attention maps (up to N=8192 tokens, D=64):
XLA's lowering materializes [B, chunk, N] f32 probability slabs in HBM
(models/blocks._chunked_attention); here each grid cell holds one query
row-block plus the ENTIRE K and V in VMEM (N*D bf16 = 1 MB at the largest
map), computes scores -> full-row softmax -> output without touching HBM
for intermediates: HBM traffic is exactly Q+K+V in, O out.

No online-softmax machinery is needed because a whole score row
[QB, N] f32 fits VMEM at these shapes (QB chosen so QB*N*4 <= 6 MB).

Numerics match the pure path bit-for-bit-ish: scores accumulate in f32 on
the MXU, probabilities are cast to the value dtype before the PV matmul
(exactly like the XLA path), output cast to the query dtype.

Eligibility (`flash_eligible`): TPU backend, N % QB == 0, K/V block + score
block within the VMEM budget. Callers fall back to the chunked XLA path
otherwise. Backward is NOT defined — use it on no-grad paths (the sampling
chain); training keeps the XLA chunked path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_SCORE_BYTES = 6 * 1024 * 1024  # f32 score block budget per grid cell
_KV_BYTES = 4 * 1024 * 1024  # K + V resident budget (each)
_VMEM_LIMIT = 100 * 1024 * 1024


def _pick_qb(n: int) -> int | None:
    qb = min(n, max(8, _SCORE_BYTES // (n * 4)))
    # largest power-of-two-ish divisor of n that is <= qb and multiple of 8
    while qb >= 8:
        if n % qb == 0 and qb % 8 == 0:
            return qb
        qb -= 8
    return None


def flash_eligible(b: int, n: int, d: int, itemsize: int) -> bool:
    if jax.devices()[0].platform != "tpu":
        return False
    if jax.device_count() > 1:
        # Under a multi-device mesh the jitted sampler traces pallas_call
        # with the GLOBAL (data-sharded) batch, which GSPMD cannot partition
        # through the kernel — it would force replication or fail to lower.
        # Only the measured single-chip context routes here; multi-chip
        # sampling keeps the XLA chunked path (models/blocks.py), which
        # GSPMD shards cleanly over the batch axis.
        return False
    if d % 8 or n % 8:
        return False
    if n * d * itemsize > _KV_BYTES:
        return False
    return _pick_qb(n) is not None


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0]  # [QB, D]
    k = k_ref[0]  # [N, D]
    v = v_ref[0]  # [N, D]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [QB, N]
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    o = jnp.dot(p, v, preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


def flash_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """Exact attention, [B, N, D] -> [B, N, D]. Check flash_eligible first."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, d = q.shape
    qb = _pick_qb(n)
    if qb is None:
        raise ValueError(f"no row block for n={n}")
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        )
    return pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b, n, d), q.dtype),
        grid=(b, n // qb),
        in_specs=[
            pl.BlockSpec((1, qb, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, qb, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        **kwargs,
    )(q, k, v)
