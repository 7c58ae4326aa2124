#!/usr/bin/env python
"""Reference-scale training driver: the reference's standard 200k-iteration
recipe (configs/experiment_configs/phydiff/resdiff+physics_train_example.json:
79-96 — n_iter 200000, val every 10k, checkpoint every 10k, Adam 1e-4,
EMA decay 0.9999 from step 5000) run end-to-end through this framework's own
train.py CLI on the spectrally-realistic synthetic WeatherBench tree
(data/store.py spectrum="t2m").

Steps:
  1. generate the synthetic data tree under <workdir>/data (idempotent),
  2. write a patched experiment config to <workdir>/config.json,
  3. exec `python train.py -c <workdir>/config.json -p train`.

The run writes experiments/<name>_<ts>/{logs,checkpoint,results} under the
workdir; checkpoints rotate (train.checkpoint_keep) so a 200k run keeps the
last few I{iter}_E{epoch} states plus the loss/val logs. Evaluate afterwards:

    python scripts/quality_e2e.py --arch phydiff --reuse-checkpoint \
        <workdir>/experiments/<run>/checkpoint/I200000_E<n> --sweep-fast ...
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="phydiff")
    ap.add_argument("--iters", type=int, default=200000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--val-batch", type=int, default=8)
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--spectrum", default="t2m")
    ap.add_argument("--data-min", default="2017-01-01-00")
    ap.add_argument("--data-max", default="2017-05-01-00")
    ap.add_argument("--train-min", default="2017-01-01-00")
    ap.add_argument("--train-max", default="2017-04-28-00")
    ap.add_argument("--val-min", default="2017-04-28-00")
    ap.add_argument("--val-max", default="2017-04-30-00")
    ap.add_argument("--val-freq", type=int, default=10000)
    ap.add_argument("--save-freq", type=int, default=10000)
    ap.add_argument("--print-freq", type=int, default=500)
    ap.add_argument("--checkpoint-keep", type=int, default=3)
    ap.add_argument("--ema-decay", type=float, default=0.9999,
                    help="reference recipe is 0.9999, which needs >=50k "
                         "steps past --ema-start to converge onto the "
                         "trajectory; short runs (<50k iters) should use "
                         "0.999 or the EMA rows will lag the raw weights")
    ap.add_argument("--ema-start", type=int, default=5000)
    ap.add_argument("--grad-clip", type=float, default=None,
                    help="global-norm gradient clip (train.optimizer."
                         "grad_clip); sr3 needs ~1.0 on the spectral "
                         "benchmark (unclipped it collapses at ~5.5k steps)")
    ap.add_argument("--dropout", type=float, default=0.0,
                    help="the reference example uses 0.2; synthetic runs "
                         "converge faster without it")
    ap.add_argument("--pretrained-model", default=None,
                    help="encoder checkpoint path (srdiff/physrdiff)")
    ap.add_argument("--pretrained-num-block", type=int, default=None,
                    help="RRDB trunk depth of the pretrained encoder "
                         "(must match the checkpoint; default 17, the "
                         "reference's hardcoded value)")
    ap.add_argument("--pretrained-hidden-size", type=int, default=None)
    ap.add_argument("--config-only", action="store_true",
                    help="generate data + config, skip the training run")
    ap.add_argument("--hr-shape", type=int, nargs=2, default=(128, 256),
                    help="HR grid (CPU smoke tests can shrink it)")
    ap.add_argument("--inner-channel", type=int, default=None,
                    help="shrink the UNet trunk (CPU smoke tests)")
    ap.add_argument("--res-blocks", type=int, default=None)
    ap.add_argument("--platform", default=None,
                    help="forwarded to train.py (e.g. cpu)")
    ap.add_argument("--no-device-cache", action="store_true",
                    help="stream batches from host instead of caching the "
                         "normalized train split in HBM (data/device_cache.py)")
    args = ap.parse_args()

    work = Path(args.workdir)
    work.mkdir(parents=True, exist_ok=True)

    # ------------------------------------------------------------ 1. data
    dataroot = work / "data"
    marker = dataroot / ".complete"
    if not marker.exists():
        from srewd_tpu.data.store import make_synthetic_weatherbench

        print(f"[data] generating {args.spectrum} tree "
              f"{args.data_min}..{args.data_max} -> {dataroot}", flush=True)
        hh, hw = args.hr_shape
        make_synthetic_weatherbench(
            str(dataroot), args.data_min, args.data_max, spectrum=args.spectrum,
            hr_shape=(hh, hw), lr_shape=(hh // 4, hw // 4),
        )
        marker.write_text("ok\n")
    else:
        print(f"[data] reusing {dataroot}", flush=True)

    # ---------------------------------------------------------- 2. config
    from srewd_tpu.configs.config import load_commented_json
    from srewd_tpu.data.timeindex import hourly_range, months_of

    opt = load_commented_json(
        str(REPO / "configs/experiment_configs/sr3/sr3_base_train.json")
    )
    months = sorted(set(months_of(
        hourly_range(args.data_min, args.data_max)).tolist()))
    opt["name"] = f"{args.arch}_refscale_{args.iters // 1000}k"
    opt["path"]["experiments_folder_path"] = str(work / "experiments")
    # preemption recovery: a relaunch of the same command resumes from the
    # newest I{iter}_E{epoch} checkpoint of this experiment name (config.py
    # _find_latest_checkpoint); first launch finds none and starts fresh
    opt["path"]["resume_state"] = "auto"
    opt["model"]["architecture"] = args.arch
    opt["model"]["unet"]["dropout"] = args.dropout
    if args.inner_channel:
        opt["model"]["unet"]["inner_channel"] = args.inner_channel
    if args.res_blocks:
        opt["model"]["unet"]["res_blocks"] = args.res_blocks
    opt["model"]["diffusion"]["image_height"] = args.hr_shape[0]
    opt["model"]["diffusion"]["image_width"] = args.hr_shape[1]
    opt["data"]["height"] = args.hr_shape[0]
    if args.pretrained_model:
        opt["model"]["pretrained_model"] = {
            "model_path": args.pretrained_model, "lock_weights": True,
        }
        if args.pretrained_num_block:
            opt["model"]["pretrained_model"]["num_block"] = args.pretrained_num_block
        if args.pretrained_hidden_size:
            opt["model"]["pretrained_model"]["hidden_size"] = args.pretrained_hidden_size
    opt["data"].update(
        dataroot=str(dataroot),
        batch_size=args.batch,
        val_batch_size=args.val_batch,
        train_min_date=args.train_min,
        train_max_date=args.train_max,
        val_min_date=args.val_min,
        val_max_date=args.val_max,
        months_subset=months,
        transform_groups={f"m{m}": [m] for m in months},
    )
    if args.grad_clip:
        opt["train"]["optimizer"]["grad_clip"] = args.grad_clip
    opt["train"].update(
        n_iter=args.iters,
        val_freq=args.val_freq,
        full_val_freq=args.val_freq,
        save_checkpoint_freq=args.save_freq,
        print_freq=args.print_freq,
        save_visualizations=True,
        checkpoint_keep=args.checkpoint_keep,
        device_data_cache=not args.no_device_cache,
        ema_scheduler={
            # reference example values (parsed-but-unused there; functional
            # here) + the use_for_val extension so val logs track the EMA
            "enabled": True,
            "step_start_ema": args.ema_start,
            "update_ema_every": 1,
            "ema_decay": args.ema_decay,
            "use_for_val": True,
        },
    )
    cfg_path = work / "config.json"
    cfg_path.write_text(json.dumps(opt, indent=2) + "\n")
    print(f"[config] -> {cfg_path}", flush=True)
    if args.config_only:
        return

    # ------------------------------------------------------------- 3. run
    cmd = [sys.executable, str(REPO / "train.py"), "-c", str(cfg_path), "-p", "train"]
    if args.platform:
        cmd += ["--platform", args.platform]
    print("[run]", " ".join(cmd), flush=True)
    os.execv(sys.executable, cmd)


if __name__ == "__main__":
    main()
