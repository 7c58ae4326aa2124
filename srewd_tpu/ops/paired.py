"""W-paired execution of the full-resolution UNet level.

DESIGN §1 measured the full-res C=64 convs at 26% of MXU peak (64 of 128
output lanes used) and the isolated space-to-depth rewrite (ops/s2d_conv)
1.29x faster — but the per-conv rewrite REGRESSED end-to-end because every
op between two s2d convs forced a tiled-layout relayout of the 33 MB
activation (pair before, unpair after). The fix recorded there as "left on
the table" is implemented here: the ENTIRE full-resolution level executes
in the paired layout

    [B, H, W, C]  -(one reshape at level entry)->  [B, H, W/2, 2C]

with every intermediate op paired-native, so the only relayouts are one
pair() at level entry and one unpair() at level exit:

  * 3x3 stride-1 SAME convs run with the s2d-transformed kernel
    (ops/s2d_conv.s2d_kernel): 2x the MACs at the measured ~3.7x per-MAC
    efficiency of full 128-lane tiles;
  * 1x1 convs become feature_group_count=2 convs with the kernel applied
    per phase — exactly 1x the MACs, no waste;
  * GroupNorm folds the two phases of each channel into one statistic on a
    [B, 2C] reduction (big-tensor traffic identical to the unpaired GN);
  * per-channel broadcasts (GN affine, FeatureWiseAffine noise injection,
    conv bias) tile channel vectors to (phase, channel) order;
  * skip concatenation re-canonicalizes to phase-major channel order
    inside the concat copy it performs anyway.

Channel convention: paired channel index d = phase * C + c, i.e. the first
C channels are the even-W columns, the next C the odd — exactly what the
row-major NHWC reshape produces, kept phase-major across concats.

The paired level is exact (same dot products, f32 accumulation; only the
summation order differs) and fully differentiable — the kernel transforms
are pure gathers/concats, so autodiff produces gradients w.r.t. the
ORIGINAL [3,3,C,O] parameters and the checkpoint tree is unchanged.

Routing lives in models/blocks.py (`paired_region`) + models/unet.py;
SREWD_PAIRED_LEVEL gates it (see blocks.py for the measured default).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .s2d_conv import s2d_kernel


def pair(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] -> [B, H, W/2, 2C] (phase-major channels). One relayout."""
    b, h, w, c = x.shape
    if w % 2:
        raise ValueError(f"even W required, got {w}")
    # row-major NHWC flattening of (w-pair, phase, c) puts d = phase*C + c:
    # the plain reshape IS phase-major (matches ops/s2d_conv's kernel layout)
    return x.reshape(b, h, w // 2, 2 * c)


def unpair(xp: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W/2, 2C] -> [B, H, W, C]. One relayout."""
    b, h, w2, c2 = xp.shape
    if c2 % 2:
        raise ValueError(f"even channel count required, got {c2}")
    return xp.reshape(b, h, w2 * 2, c2 // 2)


def paired_concat(*tensors: jnp.ndarray) -> jnp.ndarray:
    """Channel-concat paired tensors, re-canonicalizing to phase-major.

    concat([a, b]) of paired tensors would yield [a_even, a_odd, b_even,
    b_odd]; downstream paired ops need [a_even, b_even, a_odd, b_odd].

    SUPERSEDED on the hot path: the channel slices land on half-tile (64
    lane) boundaries, which TPU relayouts — measured 476 µs for
    paired_concat+conv3x3 vs 409 µs for a plain concat consumed by a
    SEGMENT-PERMUTED kernel (scripts/profile_paired_chain.py). The model
    now concatenates plainly and passes `segments=` to the consuming ops,
    which permute the WEIGHTS instead (pure [3,3,C,O]-sized data movement,
    hoisted by XLA LICM). Kept for tests and as the layout-canonicalizing
    fallback.
    """
    evens = [t[..., : t.shape[-1] // 2] for t in tensors]
    odds = [t[..., t.shape[-1] // 2:] for t in tensors]
    return jnp.concatenate(evens + odds, axis=-1)


def _segment_perm(segments: tuple[int, ...]) -> list[int]:
    """Phase-major kernel-row index for each SEGMENTED input row.

    A segmented paired tensor is the plain channel-concat of paired
    tensors: [s1_even, s1_odd, s2_even, s2_odd, ...]. Row r of the
    segmented layout (segment k, phase p, local channel c) corresponds to
    phase-major row p * C + (cum_k + c), C = sum(segments).
    """
    c_total = sum(segments)
    perm: list[int] = []
    cum = 0
    for s in segments:
        perm.extend(range(cum, cum + s))                      # phase 0
        perm.extend(range(c_total + cum, c_total + cum + s))  # phase 1
        cum += s
    return perm


def tile_channel_vector(v: jnp.ndarray) -> jnp.ndarray:
    """Per-channel vector [..., C] -> paired [..., 2C] (same value per phase)."""
    return jnp.concatenate([v, v], axis=-1)


def conv3x3_paired(
    xp: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray | None = None,
    segments: tuple[int, ...] | None = None,
) -> jnp.ndarray:
    """SAME 3x3 stride-1 conv on the PAIRED tensor with the ORIGINAL kernel.

    xp [B, H, W/2, 2C]; kernel [3, 3, C, O]; output stays paired
    [B, H, W/2, 2O]. The s2d kernel transform is pure data movement of the
    [3,3,C,O] weights — loop-invariant inside a sampling scan, hoisted by
    XLA LICM (measured in scripts/profile_s2d_chain.py).

    `segments`: per-tensor original channel counts when xp is a PLAIN
    channel-concat of paired tensors ([a_e, a_o, b_e, b_o, ...]): the
    kernel's input rows are permuted to match, so the 33 MB activation is
    never re-layouted (measured 409 vs 476 µs for the slice-based
    re-canonicalization, scripts/profile_paired_chain.py).
    """
    kp = s2d_kernel(kernel)
    if segments is not None and len(segments) > 1:
        kp = jnp.take(kp, jnp.asarray(_segment_perm(tuple(segments))), axis=2)
    yp = jax.lax.conv_general_dilated(
        xp, kp, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32 if xp.dtype == jnp.float32 else None,
    ).astype(xp.dtype)
    if bias is not None:
        yp = yp + tile_channel_vector(bias).astype(yp.dtype)
    return yp


def conv1x1_paired(
    xp: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray | None = None,
    segments: tuple[int, ...] | None = None,
) -> jnp.ndarray:
    """1x1 conv on the paired tensor via a BLOCK-DIAGONAL dense kernel.

    Phase p's output channels read only phase p's input channels, so the
    paired 1x1 is exactly expressible as feature_group_count=2 — but XLA's
    grouped-conv lowering measured 355 µs vs 201 for the direct layout at
    the shortcut site, while the equivalent dense [1,1,2C,2O] kernel with
    structural zeros off the phase diagonal runs in 57 µs (2x the MACs of
    a bandwidth-bound op; scripts/profile_paired_chain.py). The zero
    blocks contribute exact +0.0 to the f32 accumulation.

    Built from slice+pad+concat of the [1,1,C,O] weights (hoistable pure
    data movement, no scatters). `segments` as in conv3x3_paired: input
    rows ordered per-tensor when xp is a plain concat of paired tensors.
    """
    c, o = kernel.shape[2], kernel.shape[3]
    segs = tuple(segments) if segments is not None else (c,)
    rows = []
    cum = 0
    for s in segs:
        blk = kernel[0, 0, cum:cum + s, :]                    # [s, O]
        rows.append(jnp.pad(blk, ((0, 0), (0, o))))           # phase 0
        rows.append(jnp.pad(blk, ((0, 0), (o, 0))))           # phase 1
        cum += s
    kbd = jnp.concatenate(rows, axis=0)[None, None]           # [1,1,2C,2O]
    yp = jax.lax.conv_general_dilated(
        xp, kbd, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32 if xp.dtype == jnp.float32 else None,
    ).astype(xp.dtype)
    if bias is not None:
        yp = yp + tile_channel_vector(bias).astype(yp.dtype)
    return yp


def paired_gn_swish(
    xp: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    num_groups: int,
    eps: float,
    apply_swish: bool,
    segments: tuple[int, ...] | None = None,
) -> jnp.ndarray:
    """GroupNorm + affine (+Swish) on the paired tensor.

    Matches ops/pallas_fused._pure_gn_swish semantics (f32 stats via
    E[x^2]-E[x]^2, affine in f32, cast to storage dtype BEFORE the swish).
    Each group's statistics pool BOTH phases of its channels — i.e. exactly
    the unpaired GroupNorm statistics. Big-tensor traffic: two reductions
    and one FMA over xp, the same bytes as the unpaired path; the phase and
    group folds happen on [B, 2C] scalars.

    `segments` as in conv3x3_paired: xp is a plain concat of paired
    tensors. The phase fold and the affine-vector layout follow the
    segment order; the big-tensor math is unchanged.
    """
    b, h, w2, c2 = xp.shape
    c = c2 // 2
    cg = c // num_groups
    segs = tuple(segments) if segments is not None else (c,)
    x32 = xp.astype(jnp.float32)
    m1 = jnp.mean(x32, axis=(1, 2))               # [B, 2C]
    m2 = jnp.mean(jnp.square(x32), axis=(1, 2))   # [B, 2C]

    def fold_phases(m):
        # -> [B, C] in ORIGINAL channel order (segments are consecutive)
        parts, off = [], 0
        for s in segs:
            parts.append(0.5 * (m[:, off:off + s] + m[:, off + s:off + 2 * s]))
            off += 2 * s
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts, -1)

    m1 = fold_phases(m1)
    m2 = fold_phases(m2)
    mean_g = m1.reshape(b, num_groups, cg).mean(-1)   # [B, G]
    var_g = m2.reshape(b, num_groups, cg).mean(-1) - jnp.square(mean_g)
    inv_g = jax.lax.rsqrt(var_g + eps)
    a = scale.astype(jnp.float32)[None, :] * jnp.repeat(inv_g, cg, axis=-1)
    off = bias.astype(jnp.float32)[None, :] - jnp.repeat(mean_g, cg, axis=-1) * a

    def to_layout(v):
        # per-original-channel [B, C] -> xp's segmented paired layout [B, 2C]
        parts, cum = [], 0
        for s in segs:
            seg = v[:, cum:cum + s]
            parts.extend([seg, seg])
            cum += s
        return jnp.concatenate(parts, -1)

    a2 = to_layout(a)[:, None, None, :]
    off2 = to_layout(off)[:, None, None, :]
    y = (x32 * a2 + off2).astype(xp.dtype)
    if apply_swish:
        y = y * jax.nn.sigmoid(y)
    return y
