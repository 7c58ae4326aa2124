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
otherwise.

Training: `flash_attention_trainable` adds a custom VJP whose backward is a
second Pallas kernel over the same row-block grid — recompute scores and
probabilities from resident K/V (no saved [N, N] slab), then
  dP = dO V^T,  Δ = rowsum(P ∘ dP),  dS = P ∘ (dP − Δ) · scale,
  dQ_blk = dS K,  dK += dS^T Q_blk,  dV += P^T dO_blk,
with dK/dV accumulated in f32 VMEM across the (sequential, innermost) row
grid dimension. HBM traffic is Q+K+V+dO in, dQ+dK+dV out — versus the
chunked XLA backward's re-materialized probability slabs.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

_SCORE_BYTES = 6 * 1024 * 1024  # f32 score block budget per grid cell
_KV_BYTES = 4 * 1024 * 1024  # K + V resident budget (each)
_VMEM_LIMIT = 100 * 1024 * 1024


def _pick_qb(n: int, score_bytes: int = _SCORE_BYTES) -> int | None:
    qb = min(n, max(8, score_bytes // (n * 4)))
    # largest power-of-two-ish divisor of n that is <= qb and multiple of 8
    while qb >= 8:
        if n % qb == 0 and qb % 8 == 0:
            return qb
        qb -= 8
    return None


# backward holds three [QB, N] f32 slabs (P, dP, dS) instead of one
_SCORE_BYTES_BWD = 2 * 1024 * 1024


def flash_interpret() -> bool:
    """True when SREWD_FLASH_INTERPRET=1: route flash kernels in Pallas
    interpret mode on any platform (CPU tests of the multi-device shard_map
    routing; never set in production)."""
    return os.environ.get("SREWD_FLASH_INTERPRET", "0") == "1"


def flash_eligible(b: int, n: int, d: int, itemsize: int) -> bool:
    """Shape/platform eligibility for one device's shard.

    `b` must be the PER-DEVICE batch: under a multi-device mesh the caller
    (models/blocks._flash_route) wraps the pallas_call in jax.shard_map over
    the mesh 'data' axis — GSPMD cannot partition a pallas_call traced at
    the global batch, but per-shard the kernel is embarrassingly parallel
    (batch rows are independent).
    """
    if jax.devices()[0].platform != "tpu" and not flash_interpret():
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


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                *, scale: float):
    from jax.experimental import pallas as pl

    j = pl.program_id(1)
    q = q_ref[0]   # [QB, D]
    k = k_ref[0]   # [N, D]
    v = v_ref[0]   # [N, D]
    do = do_ref[0]  # [QB, D]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale                       # [QB, N]
    p = jax.nn.softmax(s, axis=-1)  # f32
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                               # [QB, N]
    delta = jnp.sum(p * dp, axis=-1, keepdims=True)
    ds = p * (dp - delta) * scale   # [QB, N], scale folded in

    dq_ref[0] = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dq_ref.dtype)

    dk_blk = jax.lax.dot_general(  # [N, D] contribution of this row block
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dv_blk = jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(j == 0)
    def _init():
        dk_ref[0] = dk_blk
        dv_ref[0] = dv_blk

    @pl.when(j != 0)
    def _acc():
        dk_ref[0] += dk_blk
        dv_ref[0] += dv_blk


def _flash_bwd(q, k, v, do, scale: float, interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, d = q.shape
    qb = _pick_qb(n, _SCORE_BYTES_BWD)
    if qb is None:
        raise ValueError(f"no row block for n={n}")
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        )
    blk = lambda i, j: (i, j, 0)    # noqa: E731
    whole = lambda i, j: (i, 0, 0)  # noqa: E731
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, d), jnp.float32),
            jax.ShapeDtypeStruct((b, n, d), jnp.float32),
            jax.ShapeDtypeStruct((b, n, d), jnp.float32),
        ),
        grid=(b, n // qb),  # row dim innermost -> sequential dk/dv accumulation
        in_specs=[
            pl.BlockSpec((1, qb, d), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qb, d), blk, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, qb, d), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), whole, memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
        **kwargs,
    )(q, k, v, do)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention_trainable(q, k, v, scale: float, interpret: bool = False):
    """flash_attention with a Pallas backward — safe under jax.grad.

    Check `flash_eligible_train` first (stricter row-block budget than the
    inference-only path)."""
    return flash_attention(q, k, v, scale, interpret=interpret)


def _fat_fwd(q, k, v, scale, interpret):
    return flash_attention(q, k, v, scale, interpret=interpret), (q, k, v)


def _fat_bwd(scale, interpret, res, do):
    q, k, v = res
    return _flash_bwd(q, k, v, do, scale, interpret=interpret)


flash_attention_trainable.defvjp(_fat_fwd, _fat_bwd)


def flash_eligible_train(b: int, n: int, d: int, itemsize: int) -> bool:
    """Eligibility for the differentiable path (fwd + bwd kernels)."""
    return (
        flash_eligible(b, n, d, itemsize)
        and _pick_qb(n, _SCORE_BYTES_BWD) is not None
    )
