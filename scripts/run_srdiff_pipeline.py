#!/usr/bin/env python
"""SRDiff end-to-end pipeline: RRDB pretrain -> locked-encoder diffusion train.

The one conditioning pipeline in the reference that feeds a *pretrained*
checkpoint into a diffusion run (pretrain.py:25-61 writes
pretrain_<name>_E{epoch}; srdiff configs consume it via
pretrained_model.model_path, srdiff_diffusion.py:60-70 loads + locks it).
This driver runs both stages on the spectrally-realistic synthetic tree:

  1. RRDB pretrain (pretrain.py CLI, reference recipe: Adam amsgrad 2e-4,
     L1 loss, per-epoch checkpoints — rrdb/pretrained_rrdb_17block_base.json),
  2. srdiff diffusion train via run_reference_scale.py with
     pretrained_model.model_path pointing at the last pretrain checkpoint.

Evaluate afterwards:
    python scripts/quality_e2e.py --arch srdiff \
        --reuse-checkpoint <workdir>/diffusion/experiments/.../I<N>_E<M> \
        --pretrained-model <workdir>/pretrain/checkpoint/pretrain_rrdb_E<K> \
        --sweep-fast --out QUALITY_SRDIFF_r04.json
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--dataroot", default=None,
                    help="existing synthetic tree (default: generate one "
                         "under <workdir>/data via run_reference_scale)")
    ap.add_argument("--pretrain-epochs", type=int, default=40,
                    help="reference recipe is 200 epochs x ~90 steps; the "
                         "synthetic tree converges much earlier")
    ap.add_argument("--pretrain-batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=30000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--ema-decay", type=float, default=0.999,
                    help="diffusion-stage EMA decay; the reference's 0.9999 "
                         "needs >=50k steps to converge, so the short "
                         "pipeline default is the faster 0.999 window")
    ap.add_argument("--ema-start", type=int, default=None,
                    help="diffusion-stage EMA start (default iters//2)")
    ap.add_argument("--val-freq", type=int, default=None,
                    help="diffusion-stage val/ckpt cadence "
                         "(default min(10000, iters))")
    ap.add_argument("--num-block", type=int, default=17)
    ap.add_argument("--spectrum", default="t2m")
    ap.add_argument("--data-min", default="2017-01-01-00")
    ap.add_argument("--data-max", default="2017-05-01-00")
    ap.add_argument("--train-min", default="2017-01-01-00")
    ap.add_argument("--train-max", default="2017-04-28-00")
    ap.add_argument("--val-min", default="2017-04-28-00")
    ap.add_argument("--val-max", default="2017-04-30-00")
    ap.add_argument("--hr-shape", type=int, nargs=2, default=(128, 256))
    ap.add_argument("--inner-channel", type=int, default=None)
    ap.add_argument("--res-blocks", type=int, default=None)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--skip-pretrain", action="store_true",
                    help="reuse <workdir>/pretrain/checkpoint's last state")
    args = ap.parse_args()

    work = Path(args.workdir)
    work.mkdir(parents=True, exist_ok=True)

    # ------------------------------------------------------------ 0. data
    dataroot = Path(args.dataroot) if args.dataroot else work / "data"
    if not (dataroot / ".complete").exists():
        from srewd_tpu.data.store import make_synthetic_weatherbench

        print(f"[data] generating {args.spectrum} tree -> {dataroot}", flush=True)
        hh, hw = args.hr_shape
        make_synthetic_weatherbench(
            str(dataroot), args.data_min, args.data_max, spectrum=args.spectrum,
            hr_shape=(hh, hw), lr_shape=(hh // 4, hw // 4),
        )
        (dataroot / ".complete").write_text("ok\n")

    # ------------------------------------------------- 1. RRDB pretrain
    from srewd_tpu.configs.config import load_commented_json
    from srewd_tpu.data.timeindex import hourly_range, months_of

    months = sorted(set(months_of(
        hourly_range(args.data_min, args.data_max)).tolist()))
    pre_dir = work / "pretrain"
    ckpt_dir = pre_dir / "experiments_ckpt"
    if not args.skip_pretrain:
        opt = load_commented_json(str(
            REPO / "configs/experiment_configs/rrdb/pretrained_rrdb_17block_base.json"))
        opt["name"] = "rrdb_srdiff_pipeline"
        opt["path"]["experiments_folder_path"] = str(pre_dir / "experiments")
        opt["model"]["num_block"] = args.num_block
        opt["data"].update(
            dataroot=str(dataroot),
            batch_size=args.pretrain_batch,
            val_batch_size=8,
            train_min_date=args.train_min,
            train_max_date=args.train_max,
            val_min_date=args.val_min,
            val_max_date=args.val_max,
            months_subset=months,
            transform_groups={f"m{m}": [m] for m in months},
            height=args.hr_shape[0],
        )
        opt["train"]["epoch"] = args.pretrain_epochs
        cfg = pre_dir / "pretrain_config.json"
        pre_dir.mkdir(parents=True, exist_ok=True)
        cfg.write_text(json.dumps(opt, indent=2) + "\n")
        cmd = [sys.executable, str(REPO / "pretrain.py"), "-c", str(cfg), "-p", "train"]
        if args.platform:
            cmd += ["--platform", args.platform]
        print("[pretrain]", " ".join(cmd), flush=True)
        subprocess.run(cmd, check=True)

    # newest pretrain checkpoint under the experiment tree
    cands = sorted(pre_dir.rglob("checkpoint/pretrain_*"),
                   key=lambda p: int(p.name.rsplit("_E", 1)[1]))
    if not cands:
        sys.exit(f"no pretrain checkpoints under {pre_dir}")
    enc_ckpt = cands[-1]
    print(f"[pretrain] encoder checkpoint: {enc_ckpt}", flush=True)
    (work / "encoder_checkpoint.txt").write_text(str(enc_ckpt) + "\n")

    # ------------------------------------------- 2. srdiff diffusion train
    cmd = [
        sys.executable, str(REPO / "scripts/run_reference_scale.py"),
        "--workdir", str(work / "diffusion"),
        "--arch", "srdiff",
        "--iters", str(args.iters),
        "--batch", str(args.batch),
        "--spectrum", args.spectrum,
        "--data-min", args.data_min, "--data-max", args.data_max,
        "--train-min", args.train_min, "--train-max", args.train_max,
        "--val-min", args.val_min, "--val-max", args.val_max,
        "--val-freq", str(args.val_freq or min(10000, args.iters)),
        "--save-freq", str(args.val_freq or min(10000, args.iters)),
        "--hr-shape", str(args.hr_shape[0]), str(args.hr_shape[1]),
        "--pretrained-model", str(enc_ckpt),
        "--pretrained-num-block", str(args.num_block),
        "--ema-decay", str(args.ema_decay),
        "--ema-start", str(args.ema_start if args.ema_start is not None
                           else args.iters // 2),
    ]
    if args.inner_channel:
        cmd += ["--inner-channel", str(args.inner_channel)]
    if args.res_blocks:
        cmd += ["--res-blocks", str(args.res_blocks)]
    if args.platform:
        cmd += ["--platform", args.platform]
    # share the already generated tree: symlink it into the diffusion workdir
    diff_work = work / "diffusion"
    diff_work.mkdir(parents=True, exist_ok=True)
    link = diff_work / "data"
    if not link.exists():
        link.symlink_to(dataroot.resolve())
    print("[diffusion]", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True)


if __name__ == "__main__":
    main()
