"""Headline benchmark: t2m SR fields/sec/chip, 1000-step DDPM at 128px.

Runs the full reverse-diffusion chain (T=1000, one jax.lax.scan) of the SR3
UNet at the reference problem size (t2m 1ch, LR 32x64 -> HR 128x256,
inner_channel=64, mults (1,2,4,8,8), attn at 16, res_blocks=2 — the same
network measured for the reference baseline by scripts/measure_reference.py)
on ONE chip and reports fields/sec/chip.

vs_baseline compares against the PyTorch reference measured on this host
(BASELINE_MEASURED.json): the reference publishes no numbers and its CUDA
path cannot run here, so the grounded baseline is torch-CPU on the same
machine — a cross-hardware ratio, recorded as such in BASELINE.md.

Env knobs: BENCH_BATCH (default 8), BENCH_T (default 1000),
BENCH_DTYPE (bf16|f32, default bf16), BENCH_REPEATS (default 3),
BENCH_ARCH (sr3|resdiff|phydiff|srdiff|physrdiff, default sr3 — vs_baseline is always
grounded on the sr3 trunk, the only variant the reference can run here).
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from srewd_tpu.diffusion.schedule import Schedule
    from srewd_tpu.models.factory import build_model
    from srewd_tpu.ops.resize import bicubic_up4

    batch = int(os.environ.get("BENCH_BATCH", "8"))
    n_t = int(os.environ.get("BENCH_T", "1000"))
    repeats = int(os.environ.get("BENCH_REPEATS", "3"))
    arch = os.environ.get("BENCH_ARCH", "sr3")  # any of the five variants
    dtype = jnp.bfloat16 if os.environ.get("BENCH_DTYPE", "bf16") == "bf16" else jnp.float32

    dev = jax.devices()[0]
    # srdiff's denoiser sees only the noisy map (in_channel = channels)
    in_ch = 1 if arch == "srdiff" else 2
    model = build_model(
        {
            "architecture": arch,
            "unet": {
                "in_channel": in_ch, "out_channel": 1, "inner_channel": 64,
                "norm_groups": 32, "channel_multiplier": [1, 2, 4, 8, 8],
                "attn_res": [16], "res_blocks": 2, "dropout": 0.0,
            },
            "diffusion": {
                "image_height": 128, "image_width": 256,
                "image_channels": 1, "channels": 1, "conditional": True,
            },
            # srdiff/physrdiff build their RRDB encoder from this section
            "pretrained_model": {"model_path": None, "lock_weights": True,
                                 "hidden_size": 64, "num_block": 17},
        },
        dtype=dtype,
    )
    schedule = Schedule.create("linear", n_timestep=n_t, linear_start=1e-6, linear_end=1e-2)

    rng = np.random.default_rng(0)
    hr = jnp.asarray(rng.standard_normal((batch, 128, 256, 1)), jnp.float32)
    lr = jnp.asarray(rng.standard_normal((batch, 32, 64, 1)), jnp.float32)
    params = jax.device_put(model.init(jax.random.key(0), {"HR": hr, "LR": lr}), dev)

    sampler = os.environ.get("BENCH_SAMPLER", "ddpm")  # ddpm|ddim|dpm
    ddim_steps = int(os.environ.get("BENCH_DDIM_STEPS", "50"))
    skw = ({"sampler": sampler, "ddim_steps": ddim_steps}
           if sampler in ("ddim", "dpm") else {})

    @jax.jit
    def sample(params, hr, lr, key):
        batch_d = {"HR": hr, "LR": lr, "SR": bicubic_up4(lr)}
        return model.generate_sr(params, batch_d, key, schedule, **skw)

    def run_once(k):
        # value fetch forces completion: the axon remote backend's
        # block_until_ready does not reliably wait
        out = sample(params, hr, lr, k)
        return float(jnp.sum(out.astype(jnp.float32)))

    key = jax.random.key(1)
    run_once(key)  # compile + warmup

    times = []
    for i in range(repeats):
        t0 = time.perf_counter()
        run_once(jax.random.fold_in(key, i))
        times.append(time.perf_counter() - t0)
    dt = min(times)
    fields_per_sec = batch / dt

    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "BASELINE_MEASURED.json")
    vs = 0.0
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            ref = json.load(f)["reference_fields_per_sec_T1000"]
        # scale reference to the benched T (per-step cost is constant)
        vs = fields_per_sec / (ref * (1000.0 / n_t))

    tag = (f"{ddim_steps}-step {sampler.upper()}(T={n_t})"
           if sampler in ("ddim", "dpm") else f"{n_t}-step DDPM")
    print(json.dumps({
        "metric": f"t2m SR fields/sec/chip ({tag}, 128x256, {arch})",
        "value": round(fields_per_sec, 4),
        "unit": "fields/sec/chip",
        "vs_baseline": round(vs, 2),
    }))


if __name__ == "__main__":
    try:
        sys.exit(main())
    except Exception as e:  # one retry for transient remote-TPU faults
        print(f"bench attempt 1 failed ({type(e).__name__}); retrying once",
              file=sys.stderr)
        sys.exit(main())
