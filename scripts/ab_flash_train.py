#!/usr/bin/env python
"""On-chip flash-train correctness A/B (VERDICT r2 weak #2).

The differentiable Pallas flash-attention path (SREWD_FLASH_TRAIN=1, the
training default) had gradient parity pinned only in interpret mode on CPU;
the on-chip kernel runs bf16 MXU matmuls with f32 accumulation — different
rounding than the interpret path. This script upgrades that evidence on the
real TPU:

  1. gradient cosine: at identical params and a fixed batch, the full
     gradient trees of the flash path vs the chunked-XLA path must agree
     (cosine >= 0.999, and per-tree relative L2 error reported);
  2. loss trajectory: two trainers from identical init run N steps on
     identical data/keys, one per path; the trajectories must track
     (mean of the last TAIL losses within 3%).

Writes FLASH_AB.json. Run on TPU:  python scripts/ab_flash_train.py
Env: AB_ARCH (phydiff — the arch with the largest measured flash win),
     AB_BATCH (8), AB_STEPS (300), AB_TAIL (50), AB_DTYPE (bf16)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ARCH = os.environ.get("AB_ARCH", "phydiff")
BATCH = int(os.environ.get("AB_BATCH", "8"))
STEPS = int(os.environ.get("AB_STEPS", "300"))
TAIL = int(os.environ.get("AB_TAIL", "50"))


def _model():
    import jax.numpy as jnp

    from srewd_tpu.models.factory import build_model

    dtype = (jnp.bfloat16 if os.environ.get("AB_DTYPE", "bf16") == "bf16"
             else jnp.float32)
    return build_model({
        "architecture": ARCH,
        "unet": {"in_channel": 1 if ARCH == "srdiff" else 2, "out_channel": 1,
                 "inner_channel": 64, "norm_groups": 32,
                 "channel_multiplier": [1, 2, 4, 8, 8],
                 "attn_res": [16], "res_blocks": 2, "dropout": 0.0},
        "diffusion": {"image_height": 128, "image_width": 256,
                      "image_channels": 1, "channels": 1, "conditional": True},
        "pretrained_model": {"model_path": None, "lock_weights": True,
                             "hidden_size": 64, "num_block": 17},
    }, dtype=dtype)


def _trainer():
    import optax

    from srewd_tpu.diffusion.schedule import Schedule
    from srewd_tpu.parallel.mesh import make_mesh
    from srewd_tpu.training.trainer import DiffusionTrainer

    sched = Schedule.create("linear", n_timestep=1000,
                            linear_start=1e-6, linear_end=1e-2)
    return DiffusionTrainer(model=_model(), schedule_train=sched,
                            schedule_val=sched, optimizer=optax.adam(1e-4),
                            mesh=make_mesh(1), seed=0)


def _batch(i):
    rng = np.random.default_rng(1000 + i)
    return {
        "HR": rng.standard_normal((BATCH, 128, 256, 1)).astype(np.float32),
        "LR": rng.standard_normal((BATCH, 32, 64, 1)).astype(np.float32),
        "months": np.ones((BATCH,), np.int32),
    }


def _grad_tree(trainer, batch):
    import jax
    import jax.numpy as jnp

    from srewd_tpu.models.blocks import spmd_mesh
    from srewd_tpu.ops.resize import bicubic_up4

    model, sched = trainer.model, trainer.schedule_train
    mesh = trainer.mesh

    @jax.jit
    def g(params, hr, lr, months, key):
        with spmd_mesh(mesh):
            b = {"HR": hr, "LR": lr, "SR": bicubic_up4(lr), "months": months}
            return jax.grad(model.loss)(params, b, key, sched, True)

    b = trainer._device_batch(batch)
    key = jax.random.fold_in(trainer.base_key, 12345)
    grads = g(trainer.params, b["HR"], b["LR"], b["months"], key)
    return jax.tree.map(lambda x: np.asarray(x, np.float64), grads)


def _cosine(a, b):
    import jax

    num = den_a = den_b = 0.0
    for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        num += float(np.sum(la * lb))
        den_a += float(np.sum(la * la))
        den_b += float(np.sum(lb * lb))
    return num / max(np.sqrt(den_a * den_b), 1e-30)


def main():
    t_start = time.time()

    # ---- phase 1: flash path (trace FIRST with the env set) ----
    os.environ["SREWD_FLASH_TRAIN"] = "1"
    tf = _trainer()
    tf.init_params(_batch(0))
    g_flash = _grad_tree(tf, _batch(999))
    losses_flash = [tf.train_on_batch(_batch(i)) for i in range(STEPS)]
    print(f"flash path done ({time.time()-t_start:.0f}s)",
          file=sys.stderr, flush=True)

    # ---- phase 2: chunked XLA path ----
    os.environ["SREWD_FLASH_TRAIN"] = "0"
    tc = _trainer()
    tc.init_params(_batch(0))
    g_chunk = _grad_tree(tc, _batch(999))
    losses_chunk = [tc.train_on_batch(_batch(i)) for i in range(STEPS)]
    print(f"chunked path done ({time.time()-t_start:.0f}s)",
          file=sys.stderr, flush=True)

    import jax

    cos = _cosine(g_flash, g_chunk)
    rel_l2 = float(
        np.sqrt(sum(float(np.sum((a - b) ** 2)) for a, b in
                    zip(jax.tree.leaves(g_flash), jax.tree.leaves(g_chunk))))
        / max(np.sqrt(sum(float(np.sum(b * b))
                          for b in jax.tree.leaves(g_chunk))), 1e-30)
    )
    tail_f = float(np.mean(losses_flash[-TAIL:]))
    tail_c = float(np.mean(losses_chunk[-TAIL:]))
    tail_rel = abs(tail_f - tail_c) / max(tail_c, 1e-12)
    max_step_rel = float(np.max(
        np.abs(np.asarray(losses_flash) - np.asarray(losses_chunk))
        / np.maximum(np.asarray(losses_chunk), 1e-12)))

    out = {
        "arch": ARCH, "batch": BATCH, "steps": STEPS,
        "grad_cosine": round(cos, 7), "grad_rel_l2": round(rel_l2, 6),
        "tail_mean_flash": round(tail_f, 5), "tail_mean_chunked": round(tail_c, 5),
        "tail_rel_diff": round(tail_rel, 5),
        "max_step_rel_diff": round(max_step_rel, 5),
        "first_losses_flash": [round(x, 5) for x in losses_flash[:5]],
        "first_losses_chunked": [round(x, 5) for x in losses_chunk[:5]],
        "ok": bool(cos >= 0.999 and tail_rel <= 0.03),
        "wall_sec": round(time.time() - t_start, 1),
    }
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "FLASH_AB.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    return 0 if out["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
