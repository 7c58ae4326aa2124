"""Same-process A/B of the paired full-resolution level (SREWD_PAIRED_LEVEL).

Measures, on the real TPU chip, the end-to-end effect of executing the
whole full-res UNet level in the W-paired [B,H,W/2,2C] layout
(ops/paired.py; DESIGN §1's "redesign left on the table"):

  1. sampling: T-step DDPM chain, direct vs paired, same params/key —
     reports fields/sec for both plus the numeric agreement of the outputs
     (the paired level is exact up to summation order, pinned bit-wise on
     CPU by tests/test_paired.py; this checks the bf16 MXU path);
  2. training: K-step donated-carry scan of value_and_grad + SGD update,
     direct vs paired — steps/sec for both.

Both variants are traced in ONE process (the gate is read per-trace), so
the comparison is immune to day-to-day axon tunnel swings.

Usage: python scripts/ab_paired.py [--arch sr3] [--t 500] [--batch 8]
       [--train-batch 16] [--train-steps 30] [--repeats 3]
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="sr3")
    ap.add_argument("--t", type=int, default=500)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--train-batch", type=int, default=16)
    ap.add_argument("--train-steps", type=int, default=30)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--skip-train", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from srewd_tpu.diffusion.schedule import Schedule
    from srewd_tpu.models.factory import build_model
    from srewd_tpu.ops.resize import bicubic_up4

    dtype = jnp.bfloat16
    model = build_model(
        {
            "architecture": args.arch,
            "unet": {
                "in_channel": 1 if args.arch == "srdiff" else 2,
                "out_channel": 1, "inner_channel": 64, "norm_groups": 32,
                "channel_multiplier": [1, 2, 4, 8, 8], "attn_res": [16],
                "res_blocks": 2, "dropout": 0.0,
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
    schedule = Schedule.create("linear", n_timestep=args.t,
                               linear_start=1e-6, linear_end=1e-2)

    rng = np.random.default_rng(0)
    hr = jnp.asarray(rng.standard_normal((args.batch, 128, 256, 1)), jnp.float32)
    lr = jnp.asarray(rng.standard_normal((args.batch, 32, 64, 1)), jnp.float32)
    params = model.init(jax.random.key(0), {"HR": hr, "LR": lr})
    key = jax.random.key(1)
    results = {}

    def time_sampling(paired: bool):
        os.environ["SREWD_PAIRED_LEVEL"] = "1" if paired else "0"

        @jax.jit
        def sample(params, hr, lr, key):
            batch_d = {"HR": hr, "LR": lr, "SR": bicubic_up4(lr)}
            return model.generate_sr(params, batch_d, key, schedule)

        out = sample(params, hr, lr, key)          # compile + warmup
        checksum = float(jnp.sum(out.astype(jnp.float32)))
        times = []
        for i in range(args.repeats):
            t0 = time.perf_counter()
            o = sample(params, hr, lr, jax.random.fold_in(key, i))
            float(jnp.sum(o.astype(jnp.float32)))  # axon: fetch = completion
            times.append(time.perf_counter() - t0)
        return min(times), checksum, np.asarray(out, np.float32)

    dt0, cks0, out0 = time_sampling(False)
    dt1, cks1, out1 = time_sampling(True)
    diff = float(np.max(np.abs(out0 - out1)))
    corr = float(np.corrcoef(out0.ravel(), out1.ravel())[0, 1])
    results["sampling"] = {
        "arch": args.arch, "t": args.t, "batch": args.batch,
        "direct_fields_per_sec": round(args.batch / dt0, 4),
        "paired_fields_per_sec": round(args.batch / dt1, 4),
        "speedup": round(dt0 / dt1, 4),
        "max_abs_diff": diff, "corr": corr,
    }
    print(json.dumps(results["sampling"]), flush=True)

    if not args.skip_train:
        import optax

        hr_t = jnp.asarray(
            rng.standard_normal((args.train_batch, 128, 256, 1)), jnp.float32)
        lr_t = jnp.asarray(
            rng.standard_normal((args.train_batch, 32, 64, 1)), jnp.float32)
        batch_t = {"HR": hr_t, "LR": lr_t, "SR": bicubic_up4(lr_t)}
        tx = optax.sgd(1e-4)

        def time_train(paired: bool):
            os.environ["SREWD_PAIRED_LEVEL"] = "1" if paired else "0"

            @jax.jit
            def run(params, key):
                opt_state = tx.init(params)

                def step(carry, i):
                    p, s = carry
                    k = jax.random.fold_in(key, i)
                    loss, g = jax.value_and_grad(model.loss)(
                        p, batch_t, k, schedule)
                    up, s = tx.update(g, s, p)
                    return (optax.apply_updates(p, up), s), loss

                (p, _), losses = jax.lax.scan(
                    step, (params, opt_state), jnp.arange(args.train_steps))
                return losses

            losses = run(params, key)              # compile + warmup
            first = float(losses[0])
            times = []
            for i in range(args.repeats):
                t0 = time.perf_counter()
                ls = run(params, jax.random.fold_in(key, 100 + i))
                float(jnp.sum(ls))
                times.append(time.perf_counter() - t0)
            return min(times) / args.train_steps, first

        st0, l0 = time_train(False)
        st1, l1 = time_train(True)
        results["train"] = {
            "arch": args.arch, "batch": args.train_batch,
            "direct_steps_per_sec": round(1.0 / st0, 3),
            "paired_steps_per_sec": round(1.0 / st1, 3),
            "speedup": round(st0 / st1, 4),
            "first_loss_direct": l0, "first_loss_paired": l1,
        }
        print(json.dumps(results["train"]), flush=True)

    out_path = Path(f"/tmp/ab_paired_{args.arch}.json")
    out_path.write_text(json.dumps(results, indent=1) + "\n")
    print(f"AB PAIRED OK -> {out_path}")


if __name__ == "__main__":
    main()
