"""Attribute the sr3 sampling gap to speed-of-light, per op class and level.

DESIGN.md §1 records 0.63 fields/s/chip ≈ 58% of MXU speed-of-light and
hypothesizes the residual is conv efficiency at the C=64 full-res levels.
This script MEASURES that attribution on the real chip: each distinct
(op class, shape) of the sr3 UNet at the production size is timed in
isolation as a K-iteration donated-carry lax.scan (one value fetch at the
end — the axon remote backend's block_until_ready is a no-op), and the
results are rolled up against per-op FLOP counts into a
%-of-peak-per-level table plus a reconstruction of the full step time.

The axon remote backend adds a large, day-varying dispatch+fetch round
trip to every run (measured up to ~27 s on congested days), which a
K-iteration scan only divides by K — so a null scan (carry + 1.0) is timed
with the same K and subtracted from every per-op number, and the full-chain
figure subtracts the same RTT estimate once. Raw numbers are reported
alongside.

Run on TPU: python scripts/profile_sampling.py
Env: PROF_BATCH (8), PROF_ITERS (200), PROF_DTYPE (bf16)
"""

import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = int(os.environ.get("PROF_BATCH", "8"))
ITERS = int(os.environ.get("PROF_ITERS", "200"))
PEAK_TFLOPS = 197.0  # v5e bf16
HBM_GBPS = 819.0


def main():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from srewd_tpu.models.blocks import (
        FusedGroupNorm,
        SelfAttention,
        swish,
    )

    dtype = jnp.bfloat16 if os.environ.get("PROF_DTYPE", "bf16") == "bf16" else jnp.float32

    def timed_scan(fn, x, iters=ITERS):
        """min-of-3 per-iteration seconds for y=fn(y) chained K times."""

        @jax.jit
        def run(x0):
            def body(c, _):
                return fn(c), ()

            out, _ = jax.lax.scan(body, x0, None, length=iters)
            return jnp.sum(out.astype(jnp.float32))

        float(run(x))  # compile + warmup
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(x))
            times.append(time.perf_counter() - t0)
        return min(times) / iters

    def conv_op(c_out, kernel=3, stride=1):
        m = nn.Conv(c_out, (kernel, kernel), strides=(stride, stride),
                    padding=kernel // 2, dtype=dtype)
        return m

    rng = np.random.default_rng(0)
    results = []

    # per-run dispatch+fetch RTT baseline: a K-iteration null scan costs
    # RTT + K*epsilon; subtracting its per-iteration figure from every op
    # removes the (large, day-varying) remote round trip
    null_x = jnp.zeros((8, 128), jnp.float32)
    null_dt = timed_scan(lambda y: y + 1.0, null_x)
    print(json.dumps({"op": "null scan (RTT baseline)",
                      "us": round(null_dt * 1e6, 1),
                      "rtt_est_ms": round(null_dt * ITERS * 1e3, 1)}))

    # sr3 UNet structure at 128x256, inner 64, mults (1,2,4,8,8), res_blocks 2,
    # attn at height 16 (level 3). Per level: (H, W, C, n_trunk_convs) where
    # trunk convs are the 3x3 C->C convs of the res blocks (down 2 blocks x2
    # convs + up 3 blocks x2 convs = 10) and GN+swish count matches.
    LEVELS = [
        (128, 256, 64),
        (64, 128, 128),
        (32, 64, 256),
        (16, 32, 512),
        (8, 16, 512),
    ]

    def bench_shape(name, h, w, c, fn_builder, flops, bytes_moved):
        x = jnp.asarray(rng.standard_normal((B, h, w, c)), dtype)
        m = fn_builder()
        if hasattr(m, "init"):
            params = m.init(jax.random.key(0), x)
            fn = lambda y: m.apply(params, y).astype(y.dtype)  # noqa: E731
        else:
            fn = m
        dt_raw = timed_scan(fn, x)
        dt = max(dt_raw - null_dt, 1e-9)  # RTT-corrected
        pct_peak = flops / dt / (PEAK_TFLOPS * 1e12) * 100.0
        hbm_pct = bytes_moved / dt / (HBM_GBPS * 1e9) * 100.0
        results.append({
            "op": name, "shape": [B, h, w, c], "us": round(dt * 1e6, 1),
            "us_raw": round(dt_raw * 1e6, 1),
            "gflop": round(flops / 1e9, 2), "pct_mxu_peak": round(pct_peak, 1),
            "pct_hbm_peak": round(hbm_pct, 1),
        })
        print(json.dumps(results[-1]))
        return dt

    # candidate rewrite for the C=64 full-res bottleneck (ops/s2d_conv.py)
    from srewd_tpu.ops.s2d_conv import conv3x3_s2d

    def s2d_op(c):
        k = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.05, dtype)

        def fn(y):
            return conv3x3_s2d(y, k).astype(y.dtype)

        return fn

    itemsize = 2 if dtype == jnp.bfloat16 else 4
    conv_t, gn_t, attn_t = {}, {}, {}
    for h, w, c in LEVELS:
        n = B * h * w
        conv_flops = n * 9 * c * c * 2
        conv_bytes = 2 * n * c * itemsize + 9 * c * c * itemsize
        conv_t[(h, w, c)] = bench_shape(
            f"conv3x3 {c}->{c}", h, w, c, lambda c_=c: conv_op(c_),
            conv_flops, conv_bytes,
        )
        gn_flops = n * c * 10  # stats + normalize + swish, rough
        gn_bytes = 2 * n * c * itemsize
        gn_t[(h, w, c)] = bench_shape(
            f"GN+swish g32", h, w, c,
            lambda: FusedGroupNorm(num_groups=32, with_swish=True, dtype=dtype),
            gn_flops, gn_bytes,
        )
    # the s2d-W rewrite at the two shapes where the direct conv underfills
    # the MXU output tile (c_out=64); FLOPs counted as the ORIGINAL conv's
    # so pct_mxu_peak is directly comparable to the direct rows
    h0, w0, c0 = LEVELS[0]
    bench_shape("conv3x3 64->64 s2d-W", h0, w0, c0, lambda: s2d_op(c0),
                B * h0 * w0 * 9 * c0 * c0 * 2,
                2 * B * h0 * w0 * c0 * itemsize + 9 * 4 * c0 * c0 * itemsize)

    # paired-RESIDENT rows (ops/paired.py): the carry stays in the
    # [B, H, W/2, 2C] layout across scan iterations — the steady state
    # inside a paired_region, with NO per-call pair/unpair relayouts.
    # FLOPs are the original conv's, so pct_mxu_peak compares directly.
    from srewd_tpu.ops.paired import conv3x3_paired, paired_gn_swish

    def paired_conv_op(c):
        k = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.05, dtype)
        return lambda y: conv3x3_paired(y, k).astype(y.dtype)

    def paired_gn_op(c):
        s = jnp.ones((c,), jnp.float32)
        b0 = jnp.zeros((c,), jnp.float32)
        return lambda y: paired_gn_swish(y, s, b0, 32, 1e-5, True).astype(y.dtype)

    bench_shape("conv3x3 64->64 paired-res", h0, w0 // 2, 2 * c0,
                lambda: paired_conv_op(c0),
                B * h0 * w0 * 9 * c0 * c0 * 2,
                2 * B * h0 * w0 * c0 * itemsize + 9 * 4 * c0 * c0 * itemsize)
    bench_shape("GN+swish g32 paired-res", h0, w0 // 2, 2 * c0,
                lambda: paired_gn_op(c0),
                B * h0 * w0 * c0 * 10, 2 * B * h0 * w0 * c0 * itemsize)

    # bottleneck self-attention at level 3 (16x32 = 512 tokens, C=512)
    h, w, c = 16, 32, 512
    npx = h * w
    attn_flops = B * (2 * npx * npx * c * 2 + 4 * npx * c * c * 2)  # scores+PV + qkv/out projs
    attn_bytes = 4 * B * npx * c * itemsize
    bench_shape(
        "self-attn 512tok", h, w, c,
        lambda: SelfAttention(norm_groups=32, dtype=dtype),
        attn_flops, attn_bytes,
    )

    # ---- roll-up: reconstruct one UNet step from per-level op counts ----
    # counts per level for sr3 res_blocks=2: down 2 res blocks + up 3 res
    # blocks = 5 res blocks; each has 2 (GN+swish -> conv3x3) pairs = 10
    # trunk convs + 10 GNs per level (shortcut 1x1s / up-down convs / stem /
    # final / noise MLP are counted as 'other' via the residual to the
    # measured full step).
    recon = 0.0
    per_level = []
    for h, w, c in LEVELS:
        lvl = 10 * conv_t[(h, w, c)] + 10 * gn_t[(h, w, c)]
        per_level.append({"level": f"{h}x{w}x{c}", "ms": round(lvl * 1e3, 2)})
        recon += lvl
    print(json.dumps({"reconstructed_trunk_ms": round(recon * 1e3, 2),
                      "per_level": per_level}))

    # ---- the real in-chain step for comparison ----
    if os.environ.get("PROF_SKIP_CHAIN"):
        return
    from srewd_tpu.diffusion.schedule import Schedule
    from srewd_tpu.models.factory import build_model
    from srewd_tpu.ops.resize import bicubic_up4

    model = build_model({
        "architecture": "sr3",
        "unet": {"in_channel": 2, "out_channel": 1, "inner_channel": 64,
                 "norm_groups": 32, "channel_multiplier": [1, 2, 4, 8, 8],
                 "attn_res": [16], "res_blocks": 2, "dropout": 0.0},
        "diffusion": {"image_height": 128, "image_width": 256,
                      "image_channels": 1, "channels": 1, "conditional": True},
    }, dtype=dtype)
    sched = Schedule.create("linear", n_timestep=100, linear_start=1e-6, linear_end=1e-2)
    hr = jnp.asarray(rng.standard_normal((B, 128, 256, 1)), jnp.float32)
    lr = jnp.asarray(rng.standard_normal((B, 32, 64, 1)), jnp.float32)
    params = model.init(jax.random.key(0), {"HR": hr, "LR": lr})

    @jax.jit
    def sample(params, hr, lr, key):
        return model.generate_sr(params, {"HR": hr, "LR": lr, "SR": bicubic_up4(lr)},
                                 key, sched)

    key = jax.random.key(1)
    float(jnp.sum(sample(params, hr, lr, key).astype(jnp.float32)))
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(sample(params, hr, lr, jax.random.fold_in(key, i)).astype(jnp.float32)))
        times.append(time.perf_counter() - t0)
    rtt = null_dt * ITERS
    step_ms = max(min(times) - rtt, 0.0) / 100 * 1e3
    print(json.dumps({"full_chain_step_ms": round(step_ms, 2),
                      "full_chain_step_ms_raw": round(min(times) / 100 * 1e3, 2),
                      "other_ms": round(step_ms - recon * 1e3, 2)}))


if __name__ == "__main__":
    main()
