"""Attribute the paired-level END-TO-END regression to its composition ops.

scripts/ab_paired.py measured the paired full-res level LOSING 5-6%
end-to-end while the isolated paired-resident trunk conv WINS 1.79x
(374 -> 208 us, profile_sampling.py). This script times the composition
ops the isolated row skips, on the real chip, same donated-carry-scan
methodology (RTT-subtracted):

  1. the pair/unpair relayout at level entry/exit;
  2. skip concatenation: paired_concat (channel slices at the 64-lane
     half-tile boundary -> suspected relayouts) vs plain concat, each
     followed by the conv that consumes it;
  3. the SEGMENTED alternative: plain concat (segments stay interleaved
     [a_e, a_o, b_e, b_o]) consumed by an s2d kernel with its input rows
     permuted to match — all data movement on the [3,3,C,O] weights,
     never on the 33 MB activation;
  4. the 1x1 shortcut conv: grouped (feature_group_count=2, phase-major)
     vs block-diagonal dense (segmented-compatible) vs direct.

Run on TPU: python scripts/profile_paired_chain.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = int(os.environ.get("PROF_BATCH", "8"))
ITERS = int(os.environ.get("PROF_ITERS", "200"))


def main():
    import jax
    import jax.numpy as jnp

    from srewd_tpu.ops.paired import (
        conv1x1_paired,
        conv3x3_paired,
        pair,
        paired_concat,
        unpair,
    )
    from srewd_tpu.ops.s2d_conv import s2d_kernel

    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    H, W, C = 128, 256, 64

    def timed_scan(fn, x, iters=ITERS):
        @jax.jit
        def run(x0):
            def body(c, _):
                return fn(c), ()

            out, _ = jax.lax.scan(body, x0, None, length=iters)
            return jnp.sum(out.astype(jnp.float32))

        float(run(x))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(x))
            times.append(time.perf_counter() - t0)
        return min(times) / iters

    null_dt = timed_scan(lambda y: y + 1.0, jnp.zeros((8, 128), jnp.float32))
    print(json.dumps({"op": "null scan (RTT baseline)",
                      "us": round(null_dt * 1e6, 1)}))

    def row(name, fn, x):
        dt = timed_scan(fn, x) - null_dt
        print(json.dumps({"op": name, "us": round(dt * 1e6, 1)}))
        return dt

    x_dir = jnp.asarray(rng.standard_normal((B, H, W, C)), dtype)
    x_par = pair(x_dir)  # [B, H, W/2, 2C]

    # -- 1. relayout roundtrip (unpair -> +1 -> pair); +1 row for reference
    row("add1 paired (ref)", lambda y: y + 1.0, x_par)
    row("unpair->add1->pair", lambda y: pair(unpair(y) + 1.0), x_par)

    # -- 2/3. skip-concat + trunk conv composites (up-block first conv:
    #         cat 2C=128 -> conv3x3 -> C=64)
    k = jnp.asarray(rng.standard_normal((3, 3, 2 * C, C)) * 0.05, dtype)

    def direct_cat_conv(y):
        cat = jnp.concatenate([y, y], axis=-1)
        return jax.lax.conv_general_dilated(
            cat, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")).astype(y.dtype)

    row("concat+conv3x3 direct", direct_cat_conv, x_dir)

    def paired_cat_conv(y):
        cat = paired_concat(y, y)        # phase-major [.., 4C]
        return conv3x3_paired(cat, k)    # -> [.., 2C]

    row("paired_concat+conv3x3", paired_cat_conv, x_par)

    # segmented: plain concat leaves [a_e, a_o, b_e, b_o]; permute the s2d
    # kernel's input rows (phase-major [a_e, b_e, a_o, b_o]) to match
    kp = s2d_kernel(k)                   # [3, 3, 4C, 2C]
    seg_perm = np.concatenate([
        np.arange(C),            # a_e
        np.arange(C) + 2 * C,    # a_o
        np.arange(C) + C,        # b_e
        np.arange(C) + 3 * C,    # b_o
    ])
    kp_seg = kp[:, :, seg_perm, :]

    def segmented_cat_conv(y):
        cat = jnp.concatenate([y, y], axis=-1)   # segmented [.., 4C]
        return jax.lax.conv_general_dilated(
            cat, kp_seg, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")).astype(y.dtype)

    row("plain_concat+conv3x3 segmented-kernel", segmented_cat_conv, x_par)

    # -- 4. shortcut 1x1 composites (cat 2C -> 1x1 -> C)
    k1 = jnp.asarray(rng.standard_normal((1, 1, 2 * C, C)) * 0.1, dtype)

    def direct_cat_1x1(y):
        cat = jnp.concatenate([y, y], axis=-1)
        return jax.lax.conv_general_dilated(
            cat, k1, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC")).astype(y.dtype)

    row("concat+conv1x1 direct", direct_cat_1x1, x_dir)

    def paired_cat_1x1(y):
        return conv1x1_paired(paired_concat(y, y), k1)

    row("paired_concat+conv1x1 grouped", paired_cat_1x1, x_par)

    # block-diagonal dense 1x1 in segmented order: input rows
    # [a_e, a_o, b_e, b_o], output [o_e, o_o]; phase p output reads
    # (a_p, b_p) rows -> 2x MACs of a cheap op, zero relayouts
    k1_bd = np.zeros((1, 1, 4 * C, 2 * C), np.float32)
    k1_np = np.asarray(k1, np.float32)
    for p in range(2):
        k1_bd[0, 0, p * C:(p + 1) * C, p * C:(p + 1) * C] = k1_np[0, 0, :C]
        k1_bd[0, 0, 2 * C + p * C:2 * C + (p + 1) * C, p * C:(p + 1) * C] = \
            k1_np[0, 0, C:]
    k1_bd = jnp.asarray(k1_bd, dtype)

    def segmented_cat_1x1(y):
        cat = jnp.concatenate([y, y], axis=-1)
        return jax.lax.conv_general_dilated(
            cat, k1_bd, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC")).astype(y.dtype)

    row("plain_concat+conv1x1 blockdiag", segmented_cat_1x1, x_par)

    # numeric cross-check of the segmented kernels with DISTINCT a/b
    # tensors (concat(y, y) would hide a segment-permutation bug)
    y2 = pair(jnp.asarray(rng.standard_normal((B, H, W, C)), dtype))

    def conv(cat, kk, pad):
        return jax.lax.conv_general_dilated(
            cat, kk, (1, 1), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC")).astype(cat.dtype)

    ref = np.asarray(
        conv3x3_paired(paired_concat(x_par, y2), k), np.float32)
    seg = np.asarray(
        conv(jnp.concatenate([x_par, y2], axis=-1), kp_seg, "SAME"),
        np.float32)
    print(json.dumps({"check": "conv3x3 segmented == phase-major",
                      "max_abs_diff": float(np.max(np.abs(ref - seg)))}))
    ref1 = np.asarray(
        conv1x1_paired(paired_concat(x_par, y2), k1), np.float32)
    seg1 = np.asarray(
        conv(jnp.concatenate([x_par, y2], axis=-1), k1_bd, "VALID"),
        np.float32)
    print(json.dumps({"check": "conv1x1 blockdiag == grouped",
                      "max_abs_diff": float(np.max(np.abs(ref1 - seg1)))}))


if __name__ == "__main__":
    main()
