"""Secondary benchmark: train steps/sec/chip (BASELINE.json metric #2).

Times the full jitted SPMD train step (bicubic SR + diffusion loss + grads +
Adam update, buffers donated) for the sr3 trunk at the reference problem
size. Prints one JSON line including the achieved model FLOP/s and MFU
(fwd+bwd FLOPs from XLA's own cost analysis of the lowered step, divided by
the v5e bf16 peak of 197 TFLOP/s) so training perf has the same
speed-of-light framing sampling has (DESIGN.md §1).

The axon remote PJRT client does not implement HLO cost analysis
(Lowered.cost_analysis() returns None), so the FLOP count is produced by a
CPU-platform subprocess of this same script (BENCH_FLOPS_ONLY=1) that
abstractly lowers the identical train step (jax.eval_shape — no compile,
no device work) and reads XLA's analysis there.

Env knobs: BENCH_BATCH (default 16), BENCH_DTYPE (bf16|f32), BENCH_STEPS,
BENCH_ARCH (any of the five variants).
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(os.environ.get("BENCH_BATCH", "16"))
ARCH = os.environ.get("BENCH_ARCH", "sr3")
DTYPE = os.environ.get("BENCH_DTYPE", "bf16")


def _build_trainer():
    import jax.numpy as jnp
    import optax

    from srewd_tpu.diffusion.schedule import Schedule
    from srewd_tpu.models.factory import build_model
    from srewd_tpu.parallel.mesh import make_mesh
    from srewd_tpu.training.trainer import DiffusionTrainer

    dtype = jnp.bfloat16 if DTYPE == "bf16" else jnp.float32
    model = build_model(
        {
            "architecture": ARCH,
            "unet": {
                "in_channel": 1 if ARCH == "srdiff" else 2, "out_channel": 1,
                "inner_channel": 64, "norm_groups": 32,
                "channel_multiplier": [1, 2, 4, 8, 8],
                "attn_res": [16], "res_blocks": 2, "dropout": 0.0,
            },
            "diffusion": {
                "image_height": 128, "image_width": 256,
                "image_channels": 1, "channels": 1, "conditional": True,
            },
            "pretrained_model": {"model_path": None, "lock_weights": True,
                                 "hidden_size": 64, "num_block": 17},
        },
        dtype=dtype,
    )
    sched = Schedule.create("linear", n_timestep=1000,
                            linear_start=1e-6, linear_end=1e-2)
    return DiffusionTrainer(
        model=model,
        schedule_train=sched,
        schedule_val=sched,
        optimizer=optax.adam(1e-4),
        mesh=make_mesh(1),
    )


def flops_main():
    """CPU-platform subprocess: abstract-lower the train step, print FLOPs."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    trainer = _build_trainer()
    model = trainer.model
    f32 = lambda *s: jax.ShapeDtypeStruct(s, jnp.float32)  # noqa: E731
    batch_s = {"HR": f32(BATCH, 128, 256, 1), "LR": f32(BATCH, 32, 64, 1)}
    key = jax.random.key(0)
    params_s = jax.eval_shape(model.init, key, batch_s)
    opt_s = jax.eval_shape(trainer.tx.init, params_s)
    lowered = trainer._train_step.lower(
        params_s, opt_s, batch_s["HR"], batch_s["LR"],
        jax.ShapeDtypeStruct((BATCH,), jnp.int32),
        jax.ShapeDtypeStruct((), jnp.int32),
    )
    print(json.dumps({"flops": lowered.cost_analysis()["flops"]}))


def _flops_via_subprocess():
    env = dict(os.environ, BENCH_FLOPS_ONLY="1", JAX_PLATFORMS="cpu")
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, timeout=900,
        )
    except subprocess.TimeoutExpired:
        print("flops subprocess timed out", file=sys.stderr)
        return None
    for line in reversed(out.stdout.strip().splitlines()):
        try:
            return float(json.loads(line)["flops"])
        except (json.JSONDecodeError, KeyError, TypeError):
            continue
    print(f"flops subprocess failed:\n{out.stderr[-2000:]}", file=sys.stderr)
    return None


def main():
    steps = int(os.environ.get("BENCH_STEPS", "20"))

    trainer = _build_trainer()
    rng = np.random.default_rng(0)
    b = {
        "HR": rng.standard_normal((BATCH, 128, 256, 1)).astype(np.float32),
        "LR": rng.standard_normal((BATCH, 32, 64, 1)).astype(np.float32),
        "months": np.ones((BATCH,), np.int32),
    }
    print("init...", file=sys.stderr, flush=True)
    trainer.init_params(b)
    print("compile+warmup...", file=sys.stderr, flush=True)
    trainer.train_on_batch(b)  # compile + warmup
    trainer.train_on_batch(b)

    print("timing...", file=sys.stderr, flush=True)
    # async-dispatch pipeline: enqueue all steps, then one blocking value
    # fetch of the LAST loss — the params donation chain means step N's loss
    # transitively waits on steps 1..N-1, so this times true pipelined
    # throughput (axon block_until_ready is a no-op; value fetch is the sync)
    t0 = time.perf_counter()
    last = None
    for _ in range(steps):
        last = trainer.train_on_batch_async(b)
    float(last)
    dt = (time.perf_counter() - t0) / steps

    print("cost analysis (CPU subprocess)...", file=sys.stderr, flush=True)
    step_flops = _flops_via_subprocess()

    out = {
        "metric": f"train steps/sec/chip ({ARCH} 128x256, batch {BATCH})",
        "value": round(1.0 / dt, 3),
        "unit": "steps/sec/chip",
        "samples_per_sec": round(BATCH / dt, 2),
    }
    baseline = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                            "BASELINE_MEASURED.json")
    if os.path.exists(baseline):
        with open(baseline) as f:
            ref = json.load(f)
        ref_sps = ref["reference_train_steps_per_sec"] * ref["reference_train_batch"]
        out["vs_baseline"] = round((BATCH / dt) / ref_sps, 2)  # per-sample ratio
    if step_flops:
        # v5e bf16 peak 197 TFLOP/s (f32 runs at half MXU rate)
        peak = 197e12 if DTYPE == "bf16" else 197e12 / 2
        out["model_tflops_per_sec"] = round(step_flops / dt / 1e12, 2)
        out["mfu"] = round(step_flops / dt / peak, 4)
        # the FLOP numerator is XLA cost analysis of a CPU-platform lowering;
        # the timed TPU step may route CA through Pallas kernels (different
        # program), so for CA-bearing archs MFU is an approximation
        out["flops_source"] = "xla_cost_analysis_cpu_lowering"
    print(json.dumps(out))


if __name__ == "__main__":
    if os.environ.get("BENCH_FLOPS_ONLY"):
        flops_main()
    else:
        main()
