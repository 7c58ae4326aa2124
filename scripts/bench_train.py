"""Secondary benchmark: train steps/sec/chip (BASELINE.json metric #2).

Times the full jitted SPMD train step (bicubic SR + diffusion loss + grads +
Adam update, buffers donated) for the sr3 trunk at the reference problem
size. Prints one JSON line.

Env knobs: BENCH_BATCH (default 16), BENCH_DTYPE (bf16|f32), BENCH_STEPS.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from srewd_tpu.diffusion.schedule import Schedule
    from srewd_tpu.models.factory import build_model
    from srewd_tpu.parallel.mesh import make_mesh
    from srewd_tpu.training.trainer import DiffusionTrainer

    batch = int(os.environ.get("BENCH_BATCH", "16"))
    arch = os.environ.get("BENCH_ARCH", "sr3")
    steps = int(os.environ.get("BENCH_STEPS", "20"))
    dtype = jnp.bfloat16 if os.environ.get("BENCH_DTYPE", "bf16") == "bf16" else jnp.float32

    model = build_model(
        {
            "architecture": arch,
            "unet": {
                "in_channel": 1 if arch == "srdiff" else 2, "out_channel": 1, "inner_channel": 64,
                "norm_groups": 32, "channel_multiplier": [1, 2, 4, 8, 8],
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
    trainer = DiffusionTrainer(
        model=model,
        schedule_train=Schedule.create("linear", n_timestep=1000,
                                       linear_start=1e-6, linear_end=1e-2),
        schedule_val=Schedule.create("linear", n_timestep=1000,
                                     linear_start=1e-6, linear_end=1e-2),
        optimizer=optax.adam(1e-4),
        mesh=make_mesh(1),
    )
    rng = np.random.default_rng(0)
    b = {
        "HR": rng.standard_normal((batch, 128, 256, 1)).astype(np.float32),
        "LR": rng.standard_normal((batch, 32, 64, 1)).astype(np.float32),
        "months": np.ones((batch,), np.int32),
    }
    trainer.init_params(b)
    trainer.train_on_batch(b)  # compile + warmup
    trainer.train_on_batch(b)

    t0 = time.perf_counter()
    for _ in range(steps):
        trainer.train_on_batch(b)  # fetches loss -> blocks
    dt = (time.perf_counter() - t0) / steps

    print(json.dumps({
        "metric": f"train steps/sec/chip ({arch} 128x256, batch {batch})",
        "value": round(1.0 / dt, 3),
        "unit": "steps/sec/chip",
        "samples_per_sec": round(batch / dt, 2),
    }))


if __name__ == "__main__":
    main()
