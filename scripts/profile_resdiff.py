"""Attribute the resdiff-family sampling gap (VERDICT r3 #5).

BENCH_ARCHS r3: sr3 0.74 fields/s vs resdiff/phydiff 0.59 — the CA/spliter
chain costs ~2.8 ms per UNet step at batch 8. This script times the family's
extra ops in isolation on the real chip (donated-carry scan, RTT-subtracted,
same methodology as profile_sampling.py):

  1. FDInfoSpliter, inline (the per-step cost the reference pays on every
     one of the T UNet calls, resdiff/fd_info_spliter.py:49-96);
  2. FDInfoSpliter with precomputed cond_feats (the residual per-step cost
     after models/factory.generate_sr hoists the scan-invariant frequency
     features out of the chain);
  3. fd_stencils (phydiff's stencil maps, phydiff/unet.py:311-314 — also
     hoisted);
  4. the 4 HF-guided CrossAttention sites at their production shapes
     (resdiff/guided_cross_attention.py), flash vs chunked;
  5. full-chain ms/step for sr3 / resdiff / phydiff generate_sr (T=100),
     which now includes the hoisting — compare with BENCH_ARCHS r3 to pin
     the recovered time.

Run on TPU: python scripts/profile_resdiff.py
Env: PROF_BATCH (8), PROF_ITERS (100), PROF_T (100)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = int(os.environ.get("PROF_BATCH", "8"))
ITERS = int(os.environ.get("PROF_ITERS", "100"))
T_CHAIN = int(os.environ.get("PROF_T", "100"))


def main():
    import jax
    import jax.numpy as jnp

    from srewd_tpu.models.blocks import CrossAttention, inference_attention
    from srewd_tpu.models.fd_info_spliter import FDInfoSpliter
    from srewd_tpu.ops.finite_diff import fd_stencils

    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    results = []

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
                      "us": round(null_dt * 1e6, 1),
                      "rtt_est_ms": round(null_dt * ITERS * 1e3, 1)}))

    def row(name, fn, x):
        dt = max(timed_scan(fn, x) - null_dt, 1e-9)
        results.append({"op": name, "us": round(dt * 1e6, 1)})
        print(json.dumps(results[-1]))
        return dt

    # ---- 1-2: FD spliter inline vs hoisted-residual at production size ----
    H, W = 128, 256
    spl = FDInfoSpliter(image_channels=1, out_channels=1, dtype=dtype)
    x_in = jnp.asarray(rng.standard_normal((B, H, W, 2)), jnp.float32)
    ne = jnp.asarray(rng.standard_normal((B, 64)), jnp.float32)
    sp = spl.init(jax.random.key(0), x_in, ne)["params"]
    cond = x_in[..., :1]
    cf = spl.apply({"params": sp}, cond, cond_only=True)

    # carry the noisy half so the scan has a moving input; spliter output is
    # 5C wide — fold it back to 1 channel to keep the carry shape closed
    def spliter_inline(y):
        out = spl.apply({"params": sp}, jnp.concatenate([cond, y], -1), ne)
        return jnp.mean(out, axis=-1, keepdims=True).astype(y.dtype)

    def spliter_hoisted(y):
        out = spl.apply(
            {"params": sp}, jnp.concatenate([cond, y], -1), ne, cond_feats=cf
        )
        return jnp.mean(out, axis=-1, keepdims=True).astype(y.dtype)

    xn = jnp.asarray(rng.standard_normal((B, H, W, 1)), jnp.float32)
    t_inline = row("FDInfoSpliter inline (per-step, reference semantics)",
                   spliter_inline, xn)
    t_hoist = row("FDInfoSpliter residual (cond_feats hoisted)",
                  spliter_hoisted, xn)
    print(json.dumps({"op": "spliter hoisting saves",
                      "us_per_step": round((t_inline - t_hoist) * 1e6, 1)}))

    # ---- 3: phydiff stencil maps ----
    row("fd_stencils 128x256 (phydiff, hoisted)",
        lambda y: fd_stencils(y).mean(-1, keepdims=True).astype(y.dtype), xn)

    # ---- 4: the four CA sites (x after each Downsample; query = DWT level) ----
    # (h, w, c); query channels: resdiff sums components -> 1, phydiff
    # concats 3 -> 3 (models/unet.py _wavelet_combine)
    CA_SITES = [(64, 128, 64), (32, 64, 128), (16, 32, 256), (8, 16, 512)]
    for qc, fam in ((1, "resdiff"), (3, "phydiff")):
        total = 0.0
        for h, w, c in CA_SITES:
            ca = CrossAttention(norm_groups=32, dtype=dtype)
            xf = jnp.asarray(rng.standard_normal((B, h, w, c)), dtype)
            q = jnp.asarray(rng.standard_normal((B, h, w, qc)), dtype)
            cp = ca.init(jax.random.key(1), xf, q)["params"]

            def fn(y, _ca=ca, _cp=cp, _q=q):
                with inference_attention():
                    return _ca.apply({"params": _cp}, y, _q).astype(y.dtype)

            total += row(f"CA {h}x{w} c{c} q{qc}ch [{fam}] flash", fn, xf)

            def fn_chunked(y, _ca=ca, _cp=cp, _q=q):
                return _ca.apply({"params": _cp}, y, _q).astype(y.dtype)

            row(f"CA {h}x{w} c{c} q{qc}ch [{fam}] chunked", fn_chunked, xf)
        print(json.dumps({"op": f"CA total per step [{fam}] flash",
                          "us": round(total * 1e6, 1)}))

    # ---- 5: full-chain ms/step, post-hoisting ----
    from srewd_tpu.diffusion.schedule import Schedule
    from srewd_tpu.models.factory import build_model
    from srewd_tpu.ops.resize import bicubic_up4

    sched = Schedule.create("linear", n_timestep=T_CHAIN,
                            linear_start=1e-6, linear_end=1e-2)
    hr = jnp.asarray(rng.standard_normal((B, H, W, 1)), jnp.float32)
    lr = jnp.asarray(rng.standard_normal((B, H // 4, W // 4, 1)), jnp.float32)
    batch = {"HR": hr, "LR": lr, "SR": bicubic_up4(lr)}
    rtt = null_dt * ITERS
    for arch in ("sr3", "resdiff", "phydiff"):
        model = build_model({
            "architecture": arch,
            "unet": {"in_channel": 2, "out_channel": 1, "inner_channel": 64,
                     "norm_groups": 32, "channel_multiplier": [1, 2, 4, 8, 8],
                     "attn_res": [16], "res_blocks": 2, "dropout": 0.0},
            "diffusion": {"image_height": H, "image_width": W,
                          "image_channels": 1, "channels": 1,
                          "conditional": True},
        }, dtype=dtype)
        params = model.init(jax.random.key(0), batch)

        @jax.jit
        def sample(p, b, k, _m=model):
            return _m.generate_sr(p, b, k, sched)

        key = jax.random.key(1)
        float(jnp.sum(sample(params, batch, key).astype(jnp.float32)))
        times = []
        for i in range(3):
            t0 = time.perf_counter()
            float(jnp.sum(sample(
                params, batch, jax.random.fold_in(key, i)).astype(jnp.float32)))
            times.append(time.perf_counter() - t0)
        ms = max(min(times) - rtt, 0.0) / T_CHAIN * 1e3
        print(json.dumps({"op": f"full chain step [{arch}] (hoisted)",
                          "ms_per_step": round(ms, 2),
                          "fields_per_sec_at_T1000": round(B / (ms * 1.0), 3)}))


if __name__ == "__main__":
    main()
