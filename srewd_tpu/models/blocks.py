"""Shared NN blocks of every diffusion UNet, as Flax NHWC modules.

These correspond to the reference's hot modules (SURVEY.md §2.4):
  PositionalEncoding / Swish / Mish / Upsample / Downsample
    (reference: models/diffusion_models/nn_modules/functional_layers.py)
  Block / ResnetBlock / SelfAttention / ResnetBlocWithAttn / FeatureWiseAffine
    (reference: models/diffusion_models/nn_modules/resnet.py)

TPU-first choices:
  * NHWC layout (native TPU conv layout); params float32, compute dtype
    configurable (bfloat16 recommended on TPU).
  * Self-attention over flattened spatial tokens as one batched matmul pair —
    the reference's einsum produces a [B,n,H,W,H,W] 6-D tensor
    (resnet.py:90-97); flattening to [B,n,HW,HW] maps directly onto the MXU.
  * Nearest-upsample is a broadcast-reshape, not a gather.

Numerics parity notes:
  * GroupNorm eps 1e-5 (torch default).
  * Attention scale is 1/sqrt(total_channels) — NOT per-head dim — matching
    resnet.py:92.
  * The noise-level MLP uses Swish for SR3/ResDiff/PhyDiff and Mish for
    SRDiff/PhySRDiff (srdiff/unet.py:52, physrdiff/unet.py:66).
"""

from __future__ import annotations

import contextlib as _contextlib
import contextvars as _contextvars
import math
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.pallas_fused import fused_groupnorm_swish
from ..ops.resize import upsample_nearest2x

Dtype = Any

# Orthogonal kernels, zero bias: the reference applies orthogonal init to all
# Conv/Linear weights at train time (networks.py:56-77, init_weights 'orthogonal').
default_kernel_init = jax.nn.initializers.orthogonal()


def swish(x):
    return x * jax.nn.sigmoid(x)


def mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


class PositionalEncoding(nn.Module):
    """WaveGrad-style sinusoidal encoding of a continuous noise level.

    noise_level [B] -> [B, dim]. Reference: functional_layers.py:21-41.
    """

    dim: int

    @nn.compact
    def __call__(self, noise_level: jnp.ndarray) -> jnp.ndarray:
        count = self.dim // 2
        step = jnp.arange(count, dtype=jnp.float32) / count
        encoding = noise_level.astype(jnp.float32)[:, None] * jnp.exp(
            -math.log(1e4) * step[None, :]
        )
        return jnp.concatenate([jnp.sin(encoding), jnp.cos(encoding)], axis=-1)


class NoiseLevelMLP(nn.Module):
    """PositionalEncoding -> Dense(4x) -> act -> Dense(1x). [B] -> [B, dim]."""

    dim: int
    activation: Callable = swish
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, noise_level: jnp.ndarray) -> jnp.ndarray:
        t = PositionalEncoding(self.dim)(noise_level)
        t = nn.Dense(self.dim * 4, kernel_init=default_kernel_init, dtype=self.dtype)(t)
        t = self.activation(t)
        t = nn.Dense(self.dim, kernel_init=default_kernel_init, dtype=self.dtype)(t)
        return t


class FeatureWiseAffine(nn.Module):
    """Inject noise embedding into features: add, or affine (1+g)*x + b.

    Reference: resnet.py:131-157.
    """

    out_channels: int
    use_affine_level: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, noise_embed: jnp.ndarray) -> jnp.ndarray:
        mult = 2 if self.use_affine_level else 1
        h = nn.Dense(
            self.out_channels * mult, kernel_init=default_kernel_init, dtype=self.dtype
        )(noise_embed)
        h = h[:, None, None, :]
        if self.use_affine_level:
            gamma, beta = jnp.split(h, 2, axis=-1)
            if paired_active():
                from ..ops.paired import tile_channel_vector

                gamma = tile_channel_vector(gamma)
                beta = tile_channel_vector(beta)
            return (1.0 + gamma) * x + beta
        if paired_active():
            from ..ops.paired import tile_channel_vector

            h = tile_channel_vector(h)
        return x + h


class FusedGroupNorm(nn.Module):
    """GroupNorm (+ optional fused Swish) through the Pallas TPU kernel.

    Same params/semantics as nn.GroupNorm(num_groups, epsilon) followed by
    swish; on TPU the normalize+affine+swish run as ONE VMEM pass
    (ops/pallas_fused.py), elsewhere the identical pure-JAX path.
    """

    num_groups: int = 32
    epsilon: float = 1e-5
    with_swish: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, segments: Optional[tuple] = None
    ) -> jnp.ndarray:
        paired = paired_active()
        c = x.shape[-1] // 2 if paired else x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        if self.dtype is not None:
            x = x.astype(self.dtype)
            scale = scale.astype(self.dtype)
            bias = bias.astype(self.dtype)
        if paired:
            from ..ops.paired import paired_gn_swish

            return paired_gn_swish(
                x, scale, bias, self.num_groups, self.epsilon,
                self.with_swish, segments=segments,
            )
        return fused_groupnorm_swish(
            x, scale, bias, self.num_groups, self.epsilon, self.with_swish
        )


# s2d conv rewrite for MXU-underfilling 3x3 convs (ops/s2d_conv.py):
# profiling measured the C=64 full-res convs at 26% of MXU peak vs 94-96%
# for C>=128, and the rewrite 1.29x faster in ISOLATION — but default OFF:
# inside the real sampling scan the same-day end-to-end A/B REGRESSED
# 2.5x (0.636 -> 0.257 fields/s), because the isolated bench's kernel was
# a jit constant (transform constant-folded) while the chain passes
# weights as arguments and XLA does not hoist the per-step transform (see
# scripts/profile_s2d_chain.py). SREWD_S2D_CONV=1 opts in; "force" routes
# on any platform (tests exercise the path on CPU).
def _s2d_mode() -> str:
    return _os.environ.get("SREWD_S2D_CONV", "0")


# Paired-level execution (ops/paired.py): the whole full-resolution UNet
# level runs in the W-paired [B,H,W/2,2C] layout — the per-conv s2d lesson
# above, completed: relayouts happen ONLY at level entry/exit, every op in
# between is paired-native. Gated per trace by `paired_region` (set in
# models/unet.py around the full-res segments). SREWD_PAIRED_LEVEL:
# "1" routes on TPU, "force" on any platform (CPU tests), "0" off.
# DEFAULT ON: same-process on-chip A/Bs (PAIRED_AB_r03.json,
# scripts/ab_paired.py) measured sr3 sampling 1.27 -> 1.47 fields/s
# (1.16x) / train 1.10x, phydiff sampling 1.25x / train 1.08x; the path
# is exact up to summation order (bit-pinned on CPU by
# tests/test_paired.py, 500-step bf16 chain corr >= 0.9999996 on chip).
def _paired_mode() -> str:
    return _os.environ.get("SREWD_PAIRED_LEVEL", "1")


def paired_level_enabled() -> bool:
    """Trace-time gate consulted by models/unet.py."""
    import jax as _jax

    mode = _paired_mode()
    if mode == "force":
        return True
    return mode == "1" and _jax.devices()[0].platform == "tpu"


_PAIRED_REGION = _contextvars.ContextVar("srewd_paired_region", default=False)


@_contextlib.contextmanager
def paired_region(active: bool = True):
    """While active, Conv/FusedGroupNorm/FeatureWiseAffine/ResnetBlock treat
    their inputs as W-paired [B,H,W/2,2C] tensors (ops/paired.py). Param
    shapes and the checkpoint tree are IDENTICAL either way."""
    token = _PAIRED_REGION.set(active)
    try:
        yield
    finally:
        _PAIRED_REGION.reset(token)


def paired_active() -> bool:
    return _PAIRED_REGION.get()


class Conv(nn.Conv):
    """nn.Conv that routes MXU-underfilling 3x3 SAME convs through the
    exact W-paired space-to-depth rewrite on TPU (ops/s2d_conv.py), and —
    inside a `paired_region` — treats its input as an already-paired
    [B,H,W/2,2C] tensor (ops/paired.py; 3x3 stride-1 SAME and 1x1 only).

    Subclasses nn.Conv under the same class NAME so flax auto-naming — and
    therefore every checkpoint and the torch weight converter — sees the
    identical `Conv_{i}/kernel` tree. Non-eligible shapes (or
    SREWD_S2D_CONV=0, or non-TPU platforms) take nn.Conv's path untouched.
    """

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, segments: Optional[tuple] = None
    ) -> jnp.ndarray:
        from ..ops.s2d_conv import conv3x3_s2d, s2d_profitable

        if paired_active():
            from ..ops.paired import conv1x1_paired, conv3x3_paired

            ks = tuple(self.kernel_size)
            is3 = (
                ks == (3, 3)
                and self.strides in (None, 1, (1, 1))
                and self.padding in (1, "SAME", ((1, 1), (1, 1)))
            )
            is1 = (
                ks == (1, 1)
                and self.strides in (None, 1, (1, 1))
                # for 1x1 only zero padding keeps paired == plain (SAME == VALID)
                and self.padding in ("SAME", "VALID", 0, (0, 0), ((0, 0), (0, 0)))
            )
            dilated = any(
                d not in (None, 1, (1, 1))
                for d in (self.kernel_dilation, self.input_dilation)
            )
            if not (is3 or is1) or dilated or self.feature_group_count != 1 or x.ndim != 4:
                raise ValueError(
                    f"paired_region: unsupported conv {ks} stride={self.strides} "
                    f"padding={self.padding} dilation="
                    f"{(self.kernel_dilation, self.input_dilation)}"
                )
            c_in = x.shape[-1] // 2  # unpaired input channels
            kernel = self.param(
                "kernel", self.kernel_init, (*ks, c_in, self.features),
                self.param_dtype,
            )
            bias = (
                self.param(
                    "bias", self.bias_init, (self.features,), self.param_dtype
                )
                if self.use_bias else None
            )
            x, kernel, bias = nn.dtypes.promote_dtype(
                x, kernel, bias, dtype=self.dtype
            )
            fn = conv3x3_paired if is3 else conv1x1_paired
            return fn(x, kernel, bias, segments=segments)

        mode = _s2d_mode()
        eligible = (
            mode != "0"
            and tuple(self.kernel_size) == (3, 3)
            and self.strides in (None, 1, (1, 1))
            and self.padding in (1, "SAME", ((1, 1), (1, 1)))
            and self.feature_group_count == 1
            and self.kernel_dilation in (None, 1, (1, 1))
            and self.input_dilation in (None, 1, (1, 1))
            and x.ndim == 4
            and x.shape[-2] % 2 == 0
            and s2d_profitable(x.shape[-1], self.features)
            and (jax.devices()[0].platform == "tpu" or mode == "force")
        )
        if not eligible:
            return super().__call__(x)
        kernel = self.param(
            "kernel", self.kernel_init, (3, 3, x.shape[-1], self.features),
            self.param_dtype,
        )
        bias = (
            self.param("bias", self.bias_init, (self.features,), self.param_dtype)
            if self.use_bias else None
        )
        x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias, dtype=self.dtype)
        return conv3x3_s2d(x, kernel, bias)


class Block(nn.Module):
    """GroupNorm -> Swish -> Dropout -> Conv3x3. Reference: resnet.py:7-28."""

    dim_out: int
    groups: int = 32
    dropout: float = 0.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, *, train: bool = False,
        segments: Optional[tuple] = None,
    ) -> jnp.ndarray:
        # inside a paired_region, `segments` describes x as a plain concat
        # of paired tensors; GN and the conv consume it weight-side, and
        # the conv's output is phase-major again (segments do not propagate)
        h = FusedGroupNorm(
            num_groups=self.groups, with_swish=True, dtype=self.dtype
        )(x, segments=segments)
        if self.dropout > 0.0:
            h = nn.Dropout(rate=self.dropout, deterministic=not train)(h)
        h = Conv(
            self.dim_out, (3, 3), padding=1, kernel_init=default_kernel_init, dtype=self.dtype
        )(h, segments=segments)
        return h


class ResnetBlock(nn.Module):
    """Two conv blocks with noise injection and a residual 1x1 shortcut.

    Reference: resnet.py:31-59.
    """

    dim_out: int
    dropout: float = 0.0
    use_affine_level: bool = False
    norm_groups: int = 32
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, time_emb: jnp.ndarray, *, train: bool = False,
        segments: Optional[tuple] = None,
    ):
        h = Block(self.dim_out, groups=self.norm_groups, dtype=self.dtype)(
            x, train=train, segments=segments
        )
        h = FeatureWiseAffine(self.dim_out, self.use_affine_level, dtype=self.dtype)(
            h, time_emb
        )
        h = Block(self.dim_out, groups=self.norm_groups, dropout=self.dropout, dtype=self.dtype)(
            h, train=train
        )
        in_ch = x.shape[-1] // 2 if paired_active() else x.shape[-1]
        if in_ch != self.dim_out:
            # Conv (the subclass) keeps the auto-name `Conv_0` and routes the
            # 1x1 shortcut paired-natively inside a paired_region
            x = Conv(
                self.dim_out, (1, 1), kernel_init=default_kernel_init, dtype=self.dtype
            )(x, segments=segments)
        return h + x


class SelfAttention(nn.Module):
    """Full-spatial self-attention over flattened H*W tokens.

    Matches resnet.py:62-100 (qkv 1x1 no-bias, out 1x1 with bias, residual,
    scale 1/sqrt(total channels)); computed as [B,n,HW,HW] matmuls.
    """

    n_head: int = 1
    norm_groups: int = 32
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        n_head = self.n_head
        head_dim = c // n_head

        norm = FusedGroupNorm(num_groups=self.norm_groups, dtype=self.dtype)(x)
        qkv = nn.Conv(
            c * 3, (1, 1), use_bias=False, kernel_init=default_kernel_init, dtype=self.dtype
        )(norm)
        qkv = qkv.reshape(b, h * w, n_head, 3 * head_dim)
        q, k, v = jnp.split(qkv, 3, axis=-1)  # [B, HW, n, d]

        # fold heads into batch and reuse the chunked exact attention
        # (scale is 1/sqrt(total channels), NOT per-head dim: resnet.py:92)
        fold = lambda t: t.transpose(0, 2, 1, 3).reshape(b * n_head, h * w, head_dim)  # noqa: E731
        out = _chunked_attention(fold(q), fold(k), fold(v), 1.0 / math.sqrt(c))
        out = out.reshape(b, n_head, h * w, head_dim).transpose(0, 2, 1, 3)
        out = out.astype(x.dtype).reshape(b, h, w, c)
        out = nn.Conv(c, (1, 1), kernel_init=default_kernel_init, dtype=self.dtype)(out)
        return out + x


import contextlib
import contextvars
import os as _os

# Trace-time switch: inside generate_sr/sample the attention has no backward
# pass, so eligible shapes route to the Pallas flash kernel (ops/
# flash_attention.py) instead of the XLA chunked path. Training never sets
# it (the flash kernel defines no VJP).
_INFERENCE_ATTN = contextvars.ContextVar("srewd_inference_attn", default=False)


@contextlib.contextmanager
def inference_attention():
    token = _INFERENCE_ATTN.set(True)
    try:
        yield
    finally:
        _INFERENCE_ATTN.reset(token)


# CA chunk rematerialization: default OFF — measured 3.7x faster phydiff
# training on v5e (0.97 -> 3.62 steps/s at batch 16) with the saved
# attention slabs fitting comfortably in 16 GB HBM at the production
# config. Set SREWD_CA_REMAT=1 to trade backward speed for memory on
# larger-than-reference shapes.
_CA_REMAT = _os.environ.get("SREWD_CA_REMAT", "0") == "1"

# Differentiable Pallas flash attention on TRAINING paths (fwd + bwd
# kernels, ops/flash_attention.py). Default ON: measured same-day A/B on
# v5e at batch 16 bf16 — phydiff 5.49 steps/s (27.0% MFU) vs 4.01 (19.7%)
# on the no-remat chunked XLA path, a 1.37x step speedup.
# SREWD_FLASH_TRAIN=0 falls back to the chunked path. Read at trace time so
# tests can toggle it per-trainer.
def _flash_train_enabled() -> bool:
    return _os.environ.get("SREWD_FLASH_TRAIN", "1") == "1"


# The active SPMD mesh, set (at trace time) by DiffusionTrainer around its
# jitted step bodies. Under a multi-device mesh the flash kernels must run
# per-shard via jax.shard_map over the 'data' axis — GSPMD has no partition
# rule for pallas_call and would otherwise replicate the global batch
# through the kernel. Without a mesh in scope, multi-device programs keep
# the chunked XLA path (which GSPMD shards cleanly).
_SPMD_MESH = contextvars.ContextVar("srewd_spmd_mesh", default=None)


@contextlib.contextmanager
def spmd_mesh(mesh):
    token = _SPMD_MESH.set(mesh)
    try:
        yield
    finally:
        _SPMD_MESH.reset(token)


# trace-time dispatch counter; tests assert the flash kernel actually
# routed (a silent fallback to the chunked path would still be correct,
# just slow — exactly the regression VERDICT r2 flagged)
flash_route_count = 0


def _flash_route(q, k, v, scale: float):
    """Route to the Pallas flash kernel if eligible, else return None.

    Single device: direct pallas_call. Multi-device: wrap in jax.shard_map
    over the mesh 'data' axis (batch rows are independent, so the kernel is
    embarrassingly shardable; forward AND custom-VJP backward both run
    per-shard — verified grads match the global-program autodiff).
    """
    from ..ops import flash_attention as fa

    b, n, c = q.shape
    nshards = 1
    mesh = _SPMD_MESH.get()
    if jax.device_count() > 1:
        if mesh is None:
            return None
        nshards = dict(mesh.shape).get("data", 1)
        if b % nshards:
            return None
    if _INFERENCE_ATTN.get():
        eligible, kernel = fa.flash_eligible, fa.flash_attention
    elif _flash_train_enabled():
        eligible, kernel = fa.flash_eligible_train, fa.flash_attention_trainable
    else:
        return None
    if not eligible(b // nshards, n, c, q.dtype.itemsize):
        return None
    global flash_route_count
    flash_route_count += 1
    interp = fa.flash_interpret()
    fn = lambda q_, k_, v_: kernel(q_, k_, v_, scale, interp)  # noqa: E731
    if nshards > 1:
        from jax.sharding import PartitionSpec as P

        fn = jax.shard_map(
            fn,
            mesh=mesh,
            in_specs=(P("data"), P("data"), P("data")),
            out_specs=P("data"),
            check_vma=False,  # pallas_call outputs carry no vma metadata
        )
    return fn(q, k, v)

# Cap on the materialized [B, chunk, N] attention slab (bytes, f32).
# Empirically pinned on v5e-1: 64 MB (256-row chunks at the 8192-token map,
# batch 8) compiles and runs inside the sampling scan; 256 MB chunks bring
# back the device fault the chunking exists to fix. Keep at 64 MB.
_ATTN_SLAB_BYTES = 64 * 1024 * 1024


def _chunked_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float):
    """Exact full-softmax attention, computed in query chunks.

    The HF-guided CA runs at maps as large as 64x128 (8192 tokens), where a
    monolithic [B, N, N] f32 attention matrix is ~2 GB at batch 8 — enough
    to kill the device inside the sampling scan (the reference has the same
    blowup, resdiff/guided_cross_attention.py:24-44). Each query chunk still
    sees the FULL key row, so results are bitwise-equivalent to the
    monolithic einsum; jax.checkpoint keeps training memory bounded.
    """
    b, n, c = q.shape

    flashed = _flash_route(q, k, v, scale)
    if flashed is not None:
        return flashed

    def att(qc):
        a = jnp.einsum("bic,bjc->bij", qc, k, preferred_element_type=jnp.float32)
        a = jax.nn.softmax(a * scale, axis=-1).astype(qc.dtype)
        return jnp.einsum(
            "bij,bjc->bic", a, v, preferred_element_type=jnp.float32
        ).astype(qc.dtype)

    # the cap is effectively hard (4x bigger slabs fault the device); the
    # small floor only bounds graph size and can exceed the cap marginally
    # at shapes far beyond any supported config (b*n > 1M tokens).
    # Under jax.export shape polymorphism b is symbolic: size the slab for
    # the serving batch ceiling (SREWD_EXPORT_MAX_BATCH, default 16) instead
    # of dividing by it. Serving a symbolic-batch export beyond the ceiling
    # scales the effective slab past the 64 MB cap (256 MB faults the
    # device) — export_sampler documents and pins the same ceiling.
    b_static = b if isinstance(b, int) else int(
        _os.environ.get("SREWD_EXPORT_MAX_BATCH", "16")
    )
    chunk = max(64, _ATTN_SLAB_BYTES // max(1, b_static * n * 4))
    if n <= chunk:
        return att(q)
    # remat per chunk bounds training memory (recompute in backward);
    # SREWD_CA_REMAT=0 trades memory for backward speed instead
    fn = jax.checkpoint(att) if _CA_REMAT else att
    parts = [fn(q[:, lo : lo + chunk]) for lo in range(0, n, chunk)]
    return jnp.concatenate(parts, axis=1)


class CrossAttention(nn.Module):
    """HF-guided cross-attention: DWT high-freq image queries feature keys.

    Reference: resdiff/guided_cross_attention.py (HF_guided_CA) — query from
    a 1x1 no-bias projection of the wavelet image, key/value from the
    GroupNorm'd feature map, full-spatial attention, residual output.
    Computed in query chunks at large maps (see _chunked_attention).
    """

    norm_groups: int = 32
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, query_img: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        norm = FusedGroupNorm(num_groups=self.norm_groups, dtype=self.dtype)(x)
        kv = nn.Conv(
            c * 2, (1, 1), use_bias=False, kernel_init=default_kernel_init, dtype=self.dtype
        )(norm)
        k, v = jnp.split(kv.reshape(b, h * w, 2 * c), 2, axis=-1)
        q = nn.Conv(
            c, (1, 1), use_bias=False, kernel_init=default_kernel_init, dtype=self.dtype
        )(query_img).reshape(b, h * w, c)

        out = _chunked_attention(q, k, v, 1.0 / math.sqrt(c))
        out = out.astype(x.dtype).reshape(b, h, w, c)
        out = nn.Conv(c, (1, 1), kernel_init=default_kernel_init, dtype=self.dtype)(out)
        return out + x


class ResnetBlockWithAttn(nn.Module):
    """ResnetBlock optionally followed by SelfAttention. Reference: resnet.py:103-128."""

    dim_out: int
    norm_groups: int = 32
    dropout: float = 0.0
    with_attn: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, time_emb: jnp.ndarray, *, train: bool = False,
        segments: Optional[tuple] = None,
    ):
        x = ResnetBlock(
            self.dim_out,
            dropout=self.dropout,
            norm_groups=self.norm_groups,
            dtype=self.dtype,
        )(x, time_emb, train=train, segments=segments)
        if self.with_attn:
            x = SelfAttention(norm_groups=self.norm_groups, dtype=self.dtype)(x)
        return x


class Upsample(nn.Module):
    """Nearest x2 then Conv3x3 (same channels). Reference: functional_layers.py:54-67."""

    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = upsample_nearest2x(x)
        return Conv(
            x.shape[-1], (3, 3), padding=1, kernel_init=default_kernel_init, dtype=self.dtype
        )(x)


class Downsample(nn.Module):
    """Stride-2 Conv3x3 (same channels). Reference: functional_layers.py:70-82."""

    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Conv(
            x.shape[-1],
            (3, 3),
            strides=(2, 2),
            padding=1,
            kernel_init=default_kernel_init,
            dtype=self.dtype,
        )(x)


class ResSE(nn.Module):
    """Squeeze-excite with residual: x * sigmoid(MLP(avgpool(x))) + x.

    Reference: resdiff/fd_info_spliter.py:120-148.
    """

    reduction: int = 2
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        y = jnp.mean(x, axis=(1, 2))  # [B, C]
        y = nn.Dense(
            max(c // self.reduction, 1),
            use_bias=False,
            kernel_init=default_kernel_init,
            dtype=self.dtype,
        )(y)
        y = jax.nn.relu(y)
        y = nn.Dense(c, use_bias=False, kernel_init=default_kernel_init, dtype=self.dtype)(y)
        y = jax.nn.sigmoid(y)
        return x * y[:, None, None, :] + x
