"""Attribute the TRAIN step time per op class — the bwd-side counterpart of
scripts/profile_sampling.py (VERDICT r2 weak #1: train MFU was 20-27% with
no attribution).

Each distinct (op class, shape) of the production UNet is timed three ways
on the real chip as a K-iteration donated-carry lax.scan:
  fwd        y -> f(y)
  fwd+dx     y -> vjp wrt input only        (conv dgrad: ~2x fwd FLOPs)
  fwd+dx+dw  y -> full vjp incl weight grad (train cost: ~3x fwd FLOPs)
with the same null-scan RTT correction as the sampling profiler (the axon
remote backend's dispatch+fetch round trip is large and day-varying).

Also timed: the HF-guided cross-attention fwd+bwd through BOTH paths
(Pallas flash kernels vs chunked XLA) at the four boundary map sizes, the
Adam update on the full production param tree, and the real jitted train
step (bench_train's program) for the residual 'other' bucket.

Run on TPU: python scripts/profile_train.py
Env: PROF_BATCH (16), PROF_ITERS (100), PROF_DTYPE (bf16), PROF_ARCH (sr3),
     PROF_SKIP_STEP (skip the full-step measurement)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = int(os.environ.get("PROF_BATCH", "16"))
ITERS = int(os.environ.get("PROF_ITERS", "100"))
ARCH = os.environ.get("PROF_ARCH", "sr3")
PEAK_TFLOPS = 197.0  # v5e bf16
HBM_GBPS = 819.0


def main():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from srewd_tpu.models.blocks import CrossAttention, FusedGroupNorm, SelfAttention

    dtype = jnp.bfloat16 if os.environ.get("PROF_DTYPE", "bf16") == "bf16" else jnp.float32
    itemsize = 2 if dtype == jnp.bfloat16 else 4
    rng = np.random.default_rng(0)

    def timed_scan(fn, x, iters=ITERS):
        @jax.jit
        def run(x0):
            def body(c, _):
                return fn(c), ()

            out, _ = jax.lax.scan(body, x0, None, length=iters)
            # fetching one leaf forces the whole scan to have executed
            return jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32))

        float(run(x))  # compile + warmup
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(x))
            times.append(time.perf_counter() - t0)
        return min(times) / iters

    null_x = jnp.zeros((8, 128), jnp.float32)
    null_dt = timed_scan(lambda y: y + 1.0, null_x)
    print(json.dumps({"op": "null scan (RTT baseline)",
                      "us": round(null_dt * 1e6, 1),
                      "rtt_est_ms": round(null_dt * ITERS * 1e3, 1)}))

    results = []

    def record(name, shape, dt_raw, flops, bytes_moved):
        dt = max(dt_raw - null_dt, 1e-9)
        results.append({
            "op": name, "shape": shape, "us": round(dt * 1e6, 1),
            "us_raw": round(dt_raw * 1e6, 1),
            "gflop": round(flops / 1e9, 2),
            "pct_mxu_peak": round(flops / dt / (PEAK_TFLOPS * 1e12) * 100, 1),
            "pct_hbm_peak": round(bytes_moved / dt / (HBM_GBPS * 1e9) * 100, 1),
        })
        print(json.dumps(results[-1]), flush=True)
        return dt

    def three_way(name, m, x, fwd_flops, fwd_bytes):
        """fwd / fwd+dx / fwd+dx+dw timings for a flax module on input x.

        The backward passes differentiate 0.5*sum(f(x)^2) so dout == f(x):
        with a ones cotangent XLA hoists the (then input-independent) dx out
        of the timing scan and DCEs the forward entirely — measured as an
        impossible 1155%-of-peak before this fix.
        """
        params = m.init(jax.random.key(0), x)

        def loss_x(xx):
            o = m.apply(params, xx).astype(jnp.float32)
            return 0.5 * jnp.sum(jnp.square(o))

        def loss_px(pp, xx):
            o = m.apply(pp, xx).astype(jnp.float32)
            return 0.5 * jnp.sum(jnp.square(o))

        def fwd(y):
            return m.apply(params, y).astype(y.dtype)

        def fwd_dx(y):
            return jax.grad(loss_x)(y).astype(y.dtype)

        def fwd_dx_dw(y):
            dp, dx = jax.grad(loss_px, argnums=(0, 1))(params, y)
            # fold a scalar of dp into the carry so XLA cannot DCE it
            s = sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(dp))
            return (dx + s.astype(dx.dtype) * 0.0).astype(y.dtype)

        shape = list(x.shape)
        t1 = record(f"{name} fwd", shape, timed_scan(fwd, x), fwd_flops, fwd_bytes)
        t2 = record(f"{name} fwd+dx", shape, timed_scan(fwd_dx, x),
                    2 * fwd_flops, 2 * fwd_bytes)
        t3 = record(f"{name} fwd+dx+dw", shape, timed_scan(fwd_dx_dw, x),
                    3 * fwd_flops, 3 * fwd_bytes)
        return t1, t2, t3

    # UNet levels at 128x256, inner 64, mults (1,2,4,8,8)
    LEVELS = [
        (128, 256, 64),
        (64, 128, 128),
        (32, 64, 256),
        (16, 32, 512),
        (8, 16, 512),
    ]
    if os.environ.get("PROF_SMOKE"):  # CPU plumbing check only
        LEVELS = LEVELS[-2:]
    conv_train_t, gn_train_t = {}, {}
    for h, w, c in LEVELS:
        n = B * h * w
        x = jnp.asarray(rng.standard_normal((B, h, w, c)), dtype)
        conv_flops = n * 9 * c * c * 2
        conv_bytes = 2 * n * c * itemsize + 9 * c * c * itemsize
        m = nn.Conv(c, (3, 3), padding=1, dtype=dtype)
        _, _, conv_train_t[(h, w, c)] = three_way(
            f"conv3x3 {c}->{c}", m, x, conv_flops, conv_bytes)
        gn = FusedGroupNorm(num_groups=32, with_swish=True, dtype=dtype)
        _, _, gn_train_t[(h, w, c)] = three_way(
            f"GN+swish", gn, x, n * c * 10, 2 * n * c * itemsize)

    # bottleneck self-attention fwd+bwd (512 tokens, C=512)
    h, w, c = 16, 32, 512
    npx = h * w
    attn_flops = B * (2 * npx * npx * c * 2 + 4 * npx * c * c * 2)
    x = jnp.asarray(rng.standard_normal((B, h, w, c)), dtype)
    three_way("self-attn 512tok", SelfAttention(norm_groups=32, dtype=dtype),
              x, attn_flops, 4 * B * npx * c * itemsize)

    # HF-guided CA fwd+bwd at the 4 boundary maps: flash vs chunked XLA.
    # Map sizes follow the resdiff-family boundaries (query = DWT image at
    # the PRE-downsample resolution; channels = level channels).
    CA_MAPS = [(64, 128, 64), (32, 64, 128), (16, 32, 256), (8, 16, 512)]
    if os.environ.get("PROF_SMOKE"):
        CA_MAPS = CA_MAPS[-1:]
    for hh, ww, cc in CA_MAPS:
        xq = jnp.asarray(rng.standard_normal((B, hh, ww, cc)), dtype)
        qimg = jnp.asarray(rng.standard_normal((B, hh, ww, 3)), dtype)
        ca = CrossAttention(norm_groups=32, dtype=dtype)
        params = ca.init(jax.random.key(1), xq, qimg)
        nn_tok = hh * ww
        ca_flops = B * (2 * nn_tok * nn_tok * cc * 2)  # scores + PV only

        def ca_train(y, _params=params, _ca=ca, _q=qimg):
            def loss(xx):
                o = _ca.apply(_params, xx, _q).astype(jnp.float32)
                return 0.5 * jnp.sum(jnp.square(o))

            return jax.grad(loss)(y).astype(y.dtype)

        for flag, label in (("1", "flash"), ("0", "chunked")):
            os.environ["SREWD_FLASH_TRAIN"] = flag
            record(f"CA {nn_tok}tok fwd+dx [{label}]", [B, hh, ww, cc],
                   timed_scan(ca_train, xq), 3 * ca_flops,
                   6 * B * nn_tok * cc * itemsize)
    os.environ["SREWD_FLASH_TRAIN"] = "1"

    # Adam update on the full production param tree
    import optax

    from srewd_tpu.models.factory import build_model

    model = build_model({
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
    hr = jnp.asarray(rng.standard_normal((4, 128, 256, 1)), jnp.float32)
    lr = jnp.asarray(rng.standard_normal((4, 32, 64, 1)), jnp.float32)
    params = model.init(jax.random.key(0), {"HR": hr, "LR": lr})
    tx = optax.adam(1e-4)
    opt_state = tx.init(params)
    n_params = sum(x.size for x in jax.tree.leaves(params))

    def adam_fn(carry):
        p, s = carry
        grads = jax.tree.map(lambda t: t * 0.999, p)  # stand-in gradient tree
        updates, s = tx.update(grads, s, p)
        return (optax.apply_updates(p, updates), s)

    dt_raw = timed_scan(adam_fn, (params, opt_state))
    record("adam update (full tree)", [n_params], dt_raw,
           n_params * 12, n_params * 4 * 5)

    # roll-up: reconstruct the train-step trunk from per-level counts
    recon = 0.0
    per_level = []
    for h, w, c in LEVELS:
        lvl = 10 * conv_train_t[(h, w, c)] + 10 * gn_train_t[(h, w, c)]
        per_level.append({"level": f"{h}x{w}x{c}", "ms": round(lvl * 1e3, 2)})
        recon += lvl
    print(json.dumps({"reconstructed_train_trunk_ms": round(recon * 1e3, 2),
                      "per_level": per_level}), flush=True)

    if os.environ.get("PROF_SKIP_STEP"):
        return

    # the real jitted train step (bench_train program) for the residual
    from srewd_tpu.diffusion.schedule import Schedule
    from srewd_tpu.parallel.mesh import make_mesh
    from srewd_tpu.training.trainer import DiffusionTrainer

    sched = Schedule.create("linear", n_timestep=1000,
                            linear_start=1e-6, linear_end=1e-2)
    trainer = DiffusionTrainer(model=model, schedule_train=sched,
                               schedule_val=sched, optimizer=tx,
                               mesh=make_mesh(1))
    b = {
        "HR": rng.standard_normal((B, 128, 256, 1)).astype(np.float32),
        "LR": rng.standard_normal((B, 32, 64, 1)).astype(np.float32),
        "months": np.ones((B,), np.int32),
    }
    trainer.init_params(b)
    trainer.train_on_batch(b)
    trainer.train_on_batch(b)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(10):
            trainer.train_on_batch(b)
        times.append((time.perf_counter() - t0) / 10)
    step_ms = min(times) * 1e3
    print(json.dumps({"full_train_step_ms": round(step_ms, 2),
                      "reconstructed_trunk_ms": round(recon * 1e3, 2),
                      "other_ms": round(step_ms - recon * 1e3, 2)}), flush=True)

    # pipelined variant: async dispatch, one tail fetch (the donation chain
    # orders steps) — the serialized/pipelined delta IS the host overhead
    pipe = []
    for _ in range(3):
        t0 = time.perf_counter()
        last = None
        for _ in range(10):
            last = trainer.train_on_batch_async(b)
        float(last)
        pipe.append((time.perf_counter() - t0) / 10)
    pipe_ms = min(pipe) * 1e3
    print(json.dumps({"pipelined_step_ms": round(pipe_ms, 2),
                      "host_overhead_ms": round(step_ms - pipe_ms, 2)}),
          flush=True)


if __name__ == "__main__":
    main()
