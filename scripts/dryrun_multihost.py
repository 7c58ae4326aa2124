#!/usr/bin/env python
"""Two-process multi-host SPMD certification on CPU (no TPU pod needed).

The reference's only parallelism is single-process nn.DataParallel
(networks.py:166-168); this framework's multi-host story (SURVEY.md §2.8,
DESIGN.md §5) is jax.distributed.initialize + per-host disjoint index
striding (cli.py SREWD_MULTIHOST) + the same SPMD program over a global
mesh. Until now that path was asserted, never executed — this script runs
it for real:

  * spawns TWO worker processes, each with 4 virtual CPU devices, that
    jax.distributed.initialize() against a localhost coordinator (the same
    gRPC + Gloo machinery a DCN-connected TPU pod uses);
  * each worker holds only its own 4-row shard of an 8-row global batch and
    composes the global array via jax.make_array_from_process_local_data
    (the DataHandler process_index/process_count striding contract);
  * one jitted SPMD train step runs over the 2-host global mesh; the loss
    and updated parameters are compared against the identical step run
    single-process on 8 virtual devices;
  * one tiny sampling chain runs sharded and is gathered back with
    multihost_utils.process_allgather (the run_validation multi-host path).

Writes MULTIHOST.json next to the repo root:
  {"ok": true, "loss_multihost": ..., "loss_singlehost": ..., ...}

Usage:  python scripts/dryrun_multihost.py            (coordinator; ~1 min)
        python scripts/dryrun_multihost.py worker I P (internal)
        python scripts/dryrun_multihost.py single     (internal)
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

B_LOCAL, B_GLOBAL, H, W = 4, 8, 16, 32
N_STEPS = 3


def _force_cpu(n_devices: int):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "").replace(
            "--xla_force_host_platform_device_count=8", ""
        ).strip()
        + f" --xla_force_host_platform_device_count={n_devices}"
    ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    return jax


def _build_trainer(mesh=None):
    import optax

    from srewd_tpu.diffusion.schedule import Schedule
    from srewd_tpu.models.factory import DiffusionModel
    from srewd_tpu.models.unet import WeatherUNet
    from srewd_tpu.parallel.mesh import make_mesh
    from srewd_tpu.training.trainer import DiffusionTrainer

    unet = WeatherUNet(
        variant="sr3", out_channel=1, inner_channel=8, norm_groups=4,
        channel_mults=(1, 2), attn_res=(8,), res_blocks=1, dropout=0.0,
        image_height=H, image_width=W, image_channels=1,
    )
    sched = Schedule.create("linear", n_timestep=8)
    return DiffusionTrainer(
        model=DiffusionModel(arch="sr3", unet=unet),
        schedule_train=sched, schedule_val=sched,
        optimizer=optax.adam(1e-3),
        mesh=mesh if mesh is not None else make_mesh(),
        seed=0,
    )


def _global_batch(seed: int):
    import numpy as np

    rng = np.random.default_rng(seed)
    return {
        "HR": rng.standard_normal((B_GLOBAL, H, W, 1)).astype(np.float32),
        "LR": rng.standard_normal((B_GLOBAL, H // 4, W // 4, 1)).astype(np.float32),
        "months": np.ones((B_GLOBAL,), np.int32),
    }


def _param_digest(params):
    import numpy as np

    import jax

    return float(sum(np.abs(np.asarray(x)).sum() for x in jax.tree.leaves(params)))


def worker_main(process_id: int, port: str):
    jax = _force_cpu(B_LOCAL)
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=2,
        process_id=process_id,
    )
    assert jax.process_count() == 2 and jax.device_count() == 2 * B_LOCAL

    import numpy as np

    trainer = _build_trainer()
    sl = slice(process_id * B_LOCAL, (process_id + 1) * B_LOCAL)
    local = lambda b: {k: v[sl] for k, v in b.items()}  # noqa: E731

    trainer.init_params(local(_global_batch(0)))
    losses = [trainer.train_on_batch(local(_global_batch(i)))
              for i in range(N_STEPS)]

    # sharded sampling + the run_validation allgather path
    from jax.experimental import multihost_utils

    sr = trainer.sample_batch(local(_global_batch(N_STEPS)))
    sr_global = np.asarray(multihost_utils.process_allgather(sr, tiled=True))
    assert sr_global.shape == (B_GLOBAL, H, W, 1), sr_global.shape
    assert np.all(np.isfinite(sr_global))

    out = {"process_id": process_id, "losses": [float(x) for x in losses],
           "param_digest": _param_digest(trainer.params),
           "sr_digest": float(np.abs(sr_global).sum())}
    print("MHRESULT " + json.dumps(out), flush=True)


def single_main():
    _force_cpu(B_GLOBAL)
    trainer = _build_trainer()
    trainer.init_params(_global_batch(0))
    losses = [trainer.train_on_batch(_global_batch(i)) for i in range(N_STEPS)]
    out = {"losses": [float(x) for x in losses],
           "param_digest": _param_digest(trainer.params)}
    print("MHRESULT " + json.dumps(out), flush=True)


def _parse(stdout: str):
    for line in reversed(stdout.splitlines()):
        if line.startswith("MHRESULT "):
            return json.loads(line[len("MHRESULT "):])
    raise RuntimeError(f"no MHRESULT in output:\n{stdout[-3000:]}")


def coordinator_main(out_path: str | None = None):
    with socket.socket() as s:  # free localhost port for the coordinator
        s.bind(("localhost", 0))
        port = str(s.getsockname()[1])

    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    me = os.path.abspath(__file__)
    procs = [
        subprocess.Popen([sys.executable, me, "worker", str(i), port],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env, cwd=REPO)
        for i in range(2)
    ]
    single = subprocess.run([sys.executable, me, "single"],
                            capture_output=True, text=True, env=env,
                            cwd=REPO, timeout=2400)
    outs = [p.communicate(timeout=2400)[0] for p in procs]
    for p, o in zip(procs, outs):
        if p.returncode != 0:
            raise SystemExit(f"worker failed (rc={p.returncode}):\n{o[-4000:]}")
    if single.returncode != 0:
        raise SystemExit(f"single-process run failed:\n{single.stdout[-2000:]}"
                         f"\n{single.stderr[-2000:]}")

    w0, w1 = (_parse(o) for o in outs)
    ref = _parse(single.stdout)

    import numpy as np

    loss_ok = bool(np.allclose(w0["losses"], ref["losses"], rtol=2e-4))
    hosts_agree = bool(
        np.allclose(w0["losses"], w1["losses"], rtol=1e-6)
        and abs(w0["param_digest"] - w1["param_digest"]) < 1e-3
        and abs(w0["sr_digest"] - w1["sr_digest"]) < 1e-3
    )
    params_ok = bool(
        abs(w0["param_digest"] - ref["param_digest"])
        / max(ref["param_digest"], 1e-9) < 1e-4
    )
    result = {
        "ok": loss_ok and hosts_agree and params_ok,
        "n_processes": 2, "devices_per_process": B_LOCAL,
        "steps": N_STEPS,
        "losses_multihost": w0["losses"], "losses_singlehost": ref["losses"],
        "param_digest_multihost": w0["param_digest"],
        "param_digest_singlehost": ref["param_digest"],
        "hosts_agree": hosts_agree, "loss_match": loss_ok,
        "params_match": params_ok,
    }
    path = out_path or os.path.join(REPO, "MULTIHOST.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    if not result["ok"]:
        raise SystemExit("multi-host certification FAILED")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker_main(int(sys.argv[2]), sys.argv[3])
    elif len(sys.argv) > 1 and sys.argv[1] == "single":
        single_main()
    else:
        coordinator_main(sys.argv[1] if len(sys.argv) > 1 else None)
