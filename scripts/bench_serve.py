#!/usr/bin/env python
"""Serving throughput bench: sustained fields/sec through SamplerService.

Sprays mixed-size requests (1..batch fields each) at the service as fast
as they arrive in production, and times first-submit -> last-resolve.
Contrast: the same number of device batches run serially with a blocking
fetch per batch (what a naive sample.py-style loop does per request) —
the delta is what the dispatcher/resolver pipeline recovers from the
axon dispatch+fetch latency (DESIGN §10).

    python scripts/bench_serve.py [--sampler dpm --steps 25] [--requests 24]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--t", type=int, default=1000)
    ap.add_argument("--sampler", choices=["ddpm", "ddim", "dpm"], default="dpm")
    ap.add_argument("--steps", type=int, default=25,
                    help="ddim/dpm step count")
    ap.add_argument("--requests", type=int, default=24)
    ap.add_argument("--hr-shape", type=int, nargs=2, default=(128, 256),
                    help="HR grid (smoke tests can shrink it)")
    ap.add_argument("--inner-channel", type=int, default=64)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    hh, hw = args.hr_shape
    lh, lw = hh // 4, hw // 4

    if args.platform:
        import os

        os.environ["JAX_PLATFORMS"] = args.platform
        import jax

        jax.config.update("jax_platforms", args.platform)

    import jax
    import jax.numpy as jnp

    from srewd_tpu.diffusion.schedule import Schedule
    from srewd_tpu.models.factory import build_model
    from srewd_tpu.serving import SamplerService

    model = build_model(
        {
            "architecture": "sr3",
            "unet": {
                "in_channel": 2, "out_channel": 1,
                "inner_channel": args.inner_channel,
                "norm_groups": 32, "channel_multiplier": [1, 2, 4, 8, 8],
                "attn_res": [16], "res_blocks": 2, "dropout": 0.0,
            },
            "diffusion": {
                "image_height": hh, "image_width": hw,
                "image_channels": 1, "channels": 1, "conditional": True,
            },
        },
        dtype=jnp.bfloat16,
    )
    schedule = Schedule.create("linear", n_timestep=args.t,
                               linear_start=1e-6, linear_end=1e-2)
    rng = np.random.default_rng(0)
    hr = jnp.asarray(rng.standard_normal((args.batch, hh, hw, 1)), jnp.float32)
    lr = jnp.asarray(rng.standard_normal((args.batch, lh, lw, 1)), jnp.float32)
    params = model.init(jax.random.key(0), {"HR": hr, "LR": lr})

    skw = ({"sampler": args.sampler, "ddim_steps": args.steps}
           if args.sampler in ("ddim", "dpm") else {})
    svc = SamplerService(model, params, schedule, batch_size=args.batch,
                         sampler_kwargs=skw, linger_ms=1.0)

    # mixed request sizes as production traffic would arrive
    sizes = [(i % args.batch) + 1 for i in range(args.requests)]
    reqs = [np.asarray(rng.standard_normal((n, lh, lw, 1)), np.float32)
            for n in sizes]
    months = [np.ones(n, np.int32) for n in sizes]

    # warmup / compile
    svc.super_resolve(reqs[0], months[0])

    t0 = time.perf_counter()
    futs = [svc.submit(r, m) for r, m in zip(reqs, months)]
    for f in futs:
        f.result()
    dt_pipe = time.perf_counter() - t0
    stats = svc.stats()
    total_fields = sum(sizes)
    svc.close()

    # serialized contrast: same device-batch count, blocking fetch per batch
    n_batches = max(stats["device_batches"] - 1, 1)  # minus warmup
    fn = jax.jit(lambda p, x, k: model.generate_sr(p, {"LR": x}, k, schedule, **skw))
    full = jnp.asarray(rng.standard_normal((args.batch, lh, lw, 1)), jnp.float32)
    float(jnp.sum(fn(params, full, jax.random.key(9)).astype(jnp.float32)))  # warm
    t0 = time.perf_counter()
    for i in range(n_batches):
        out = fn(params, full, jax.random.fold_in(jax.random.key(10), i))
        np.asarray(out)  # blocking fetch, as a naive per-request loop does
    dt_serial = time.perf_counter() - t0

    tag = (f"{args.steps}-step {args.sampler.upper()}(T={args.t})"
           if args.sampler in ("ddim", "dpm") else f"{args.t}-step DDPM")
    print(json.dumps({
        "metric": f"served SR fields/sec/chip ({tag}, {hh}x{hw}, sr3, "
                  f"{args.requests} mixed-size requests)",
        "value": round(total_fields / dt_pipe, 4),
        "unit": "fields/sec/chip",
        "serialized_fields_per_sec": round(n_batches * args.batch / dt_serial, 4),
        "pipeline_speedup_vs_serialized": round(
            (total_fields / dt_pipe) / (n_batches * args.batch / dt_serial), 3),
        "device_batches": n_batches,
        "padded_fields": stats["padded_fields"],
        "latency_p50_ms": stats.get("latency_p50_ms"),
        "latency_p95_ms": stats.get("latency_p95_ms"),
    }))


if __name__ == "__main__":
    main()
