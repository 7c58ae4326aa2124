#!/usr/bin/env python
"""Generate the experiment-config corpus mirroring the reference's families.

Reference ships 49 configs (SURVEY.md §2.2): a phydiff monthly sweep (12
month-specialized runs), T_train x T_val ablations (100/500/1000/2000), an
RRDB block-count sweep (8-35), and per-arch train/eval/sample examples. The
reference's `train_subset_min/max_date` keys are dead (grep: never read by
any code) and are intentionally not emitted.

Run from the repo root:  python scripts/gen_configs.py
"""

import copy
import json
import os
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent / "configs" / "experiment_configs"

MONTHS = [
    "jan", "feb", "mar", "apr", "may", "jun",
    "jul", "aug", "sep", "oct", "nov", "dec",
]
MONTH_NAMES = [
    "january", "february", "march", "april", "may", "june",
    "july", "august", "september", "october", "november", "december",
]


def base(name, arch, phase="train"):
    return {
        "name": name,
        "phase": phase,
        "path": {
            "experiments_folder_path": None,
            "log": "logs", "tb_logger": "tb_logger", "results": "results",
            "checkpoint": "checkpoint", "resume_state": None,
        },
        "data": {
            "name": "WeatherBench",
            "dataroot": "/data/weatherbench_t2m_npy",
            "batch_size": 4, "val_batch_size": 8, "num_workers": 16,
            "use_shuffle": True,
            "train_min_date": "1979-01-01-00", "train_max_date": "2016-01-01-00",
            "transformation": "GlobalStandardScaling",
            "months_subset": list(range(1, 13)),
            "transform_groups": {n: [i + 1] for i, n in enumerate(MONTH_NAMES)},
            "val_min_date": "2016-01-01-00", "val_max_date": "2017-01-01-00",
            "variables": ["t2m"], "height": 128,
        },
        "model": {
            "model_name": "diffusion", "architecture": arch,
            "finetune_norm": False,
            "unet": {
                "in_channel": 2, "out_channel": 1, "inner_channel": 64,
                "norm_groups": 32, "channel_multiplier": [1, 2, 4, 8, 8],
                "attn_res": [16], "res_blocks": 2, "dropout": 0.2,
            },
            "beta_schedule": {
                "train": {"schedule": "linear", "n_timestep": 1000,
                          "linear_start": 1e-6, "linear_end": 1e-2},
                "val": {"schedule": "linear", "n_timestep": 1000,
                        "linear_start": 1e-6, "linear_end": 1e-2},
            },
            "diffusion": {"image_height": 128, "image_width": 256,
                          "image_channels": 1, "channels": 1, "conditional": True},
            "pretrained_model": {"model_path": None, "lock_weights": True},
        },
        "train": {
            "save_visualizations": True, "n_iter": 190001,
            "val_freq": 10000, "full_val_freq": 190000,
            "save_checkpoint_freq": 10000, "print_freq": 100, "val_vis_freq": 120,
            "optimizer": {"type": "adam", "lr": 1e-4},
            "ema_scheduler": {"enabled": False, "step_start_ema": 5000,
                              "update_ema_every": 1, "ema_decay": 0.9999},
        },
        "wandb": {"project": "srewd_tpu", "entity": None},
    }


def write(subdir, name, cfg):
    d = ROOT / subdir
    d.mkdir(parents=True, exist_ok=True)
    with open(d / f"{name}.json", "w") as f:
        json.dump(cfg, f, indent=2)


def main():
    # --- phydiff monthly sweep (12 month-specialized runs) ---
    for i, mon in enumerate(MONTHS):
        cfg = base(f"phydiff_{mon}_190000", "phydiff")
        cfg["data"]["months_subset"] = [i + 1]
        cfg["data"]["transform_groups"] = {MONTH_NAMES[i]: [i + 1]}
        write("phydiff", f"resdiff+physics_{mon}_190000", cfg)

    # --- phydiff T_train variants + T_train x T_val eval ablations ---
    # the reference ships the t_val == t_train combinations too
    # (resdiff+physics_100_eval_100.json, resdiff+physics_500_eval_500.json)
    for t_train in (100, 500, 1000, 2000):
        cfg = base(f"phydiff_T{t_train}", "phydiff")
        cfg["model"]["beta_schedule"]["train"]["n_timestep"] = t_train
        cfg["model"]["beta_schedule"]["val"]["n_timestep"] = t_train
        if t_train != 1000:  # T=1000 is the train example
            write("phydiff", f"resdiff+physics_{t_train}", cfg)
        for t_val in (100, 500, 1000):
            if t_train == t_val == 1000:
                continue  # the only combination the reference does not ship
            ev = copy.deepcopy(cfg)
            ev["name"] = f"phydiff_T{t_train}_eval_{t_val}"
            ev["phase"] = "val"
            ev["model"]["beta_schedule"]["val"]["n_timestep"] = t_val
            ev["path"]["resume_state"] = (
                f"experiments/phydiff_T{t_train}/checkpoint/I190000_E64"
            )
            write("phydiff", f"resdiff+physics_{t_train}_eval_{t_val}", ev)

    # --- RRDB pretrain block-count sweep (pretrain.py schema: model.name) ---
    # exact reference file names (inconsistently suffixed there:
    # pretrained_rrdb_{8,23}block.json but pretrained_rrdb_{25,27,30,35}.json)
    for nb, fname in ((8, "pretrained_rrdb_8block"),
                      (23, "pretrained_rrdb_23block"),
                      (25, "pretrained_rrdb_25"), (27, "pretrained_rrdb_27"),
                      (30, "pretrained_rrdb_30"), (35, "pretrained_rrdb_35")):
        # 17 is the committed base config
        cfg = base(f"rrdb_{nb}block", "srdiff")
        cfg["model"] = {
            "name": "RRDBNet", "in_channel": 1, "out_channel": 1,
            "hidden_size": 64, "num_block": nb,
        }
        cfg["data"]["batch_size"] = 32
        cfg["train"]["optimizer"]["lr"] = 2e-4
        cfg["train"]["epoch"] = 200
        write("rrdb", fname, cfg)

    # --- sr3 eval ---
    ev = base("sr3_eval", "sr3", phase="val")
    ev["path"]["resume_state"] = "experiments/sr3_base_train/checkpoint/I190000_E64"
    write("sr3", "sr3_eval", ev)

    # --- resdiff eval ---
    ev = base("resdiff_eval", "resdiff", phase="val")
    ev["path"]["resume_state"] = (
        "experiments/sr_resdiff_climate_first/checkpoint/I190000_E64"
    )
    write("resdiff", "resdiff_eval", ev)

    # --- DDIM fast-sampling evals (beyond-reference, arXiv:2010.02502) ---
    for steps in (25, 50, 100):
        ev = base(f"phydiff_ddim{steps}_eval", "phydiff", phase="val")
        ev["model"]["diffusion"].update(sampler="ddim", ddim_steps=steps,
                                        ddim_eta=0.0)
        ev["path"]["resume_state"] = (
            "experiments/phydiff_T1000/checkpoint/I190000_E64"
        )
        write("phydiff", f"resdiff+physics_ddim{steps}_eval", ev)

    # --- phydiff sample example ---
    smp = base("phydiff_sample_example", "phydiff", phase="val")
    smp["data"]["val_batch_size"] = 1
    write("phydiff", "resdiff+physics_sample_example", smp)

    # --- phydiff eval stragglers (exact reference names) ---
    ev = base("resdiff+physics_eval", "phydiff", phase="val")
    ev["data"].update(months_subset=[1], val_batch_size=1,
                      transform_groups={"january": [1]})
    ev["path"]["resume_state"] = "experiments/phydiff_T1000/checkpoint/I190000_E64"
    write("phydiff", "resdiff+physics_eval", ev)

    ev = base("resdiff+physics_example_eval", "phydiff", phase="val")
    ev["data"].update(  # 2-week example window (README workflow)
        train_min_date="2017-01-01-00", train_max_date="2017-01-15-00",
        val_min_date="2017-01-15-00", val_max_date="2017-01-31-00",
        months_subset=[1], transform_groups={"january": [1]},
    )
    ev["path"]["resume_state"] = (
        "experiments/phydiff_train_example/checkpoint/I190000_E64"
    )
    write("phydiff", "resdiff+physics_eval_example", ev)

    # --- host-profile variants (reference dgx_*/pc_* single-GPU configs;
    # here: same experiment deltas — batch size / n_iter / val cadence — on
    # one TPU chip; gpu_ids has no TPU analog and is not emitted) ---
    def host(fname, arch, subdir, *, bs, vbs, n_iter, months=None,
             phase="train", lock=None, unlocked=False):
        cfg = base(fname, arch, phase=phase)
        cfg["data"].update(batch_size=bs, val_batch_size=vbs)
        if months is not None:
            cfg["data"]["months_subset"] = months
            cfg["data"]["transform_groups"] = {
                MONTH_NAMES[m - 1]: [m] for m in months
            }
        cfg["train"]["n_iter"] = n_iter
        if lock is not None:
            cfg["model"]["pretrained_model"].update(
                model_path="pretrained_models/pretrain_RRDBNet_E26",
                lock_weights=lock,
                hidden_size=64, num_block=17,
            )
        if unlocked:
            cfg["model"]["pretrained_model"]["lock_weights"] = False
        write(subdir, fname, cfg)

    host("dgx_sr_phydiff_3_conv_full", "phydiff", "phydiff",
         bs=4, vbs=16, n_iter=200000, months=[1])
    host("dgx_sr_phydiff_light", "phydiff", "phydiff",
         bs=4, vbs=16, n_iter=200000, months=[1])
    host("dgx_sr_phydiff_batch8", "phydiff", "phydiff",
         bs=8, vbs=1, n_iter=800000, months=[1])
    host("pc_sr_phydiff_light", "phydiff", "phydiff",
         bs=4, vbs=1, n_iter=300000, months=[1])
    host("pc_sr_phydiff_light_eval", "phydiff", "phydiff",
         bs=4, vbs=16, n_iter=1, months=[1], phase="val")
    host("dgx_sr_sr3", "sr3", "sr3", bs=16, vbs=32, n_iter=200000, months=[1])
    host("pc_sr_sr3", "sr3", "sr3", bs=16, vbs=32, n_iter=200000, months=[1])

    # --- physrdiff family (exact reference names) ---
    host("physrdiff+rrdb_locked", "physrdiff", "physrdiff",
         bs=16, vbs=32, n_iter=200000, months=[1], lock=True)
    host("dgx_physrdiff+rrdb_locked", "physrdiff", "physrdiff",
         bs=16, vbs=32, n_iter=200000, months=[1], lock=True)
    host("dgx_ressrdiff+rrdb_locked", "physrdiff", "physrdiff",
         bs=8, vbs=16, n_iter=200000, months=[1], lock=True)

    # --- srdiff unlocked (joint RRDB finetune, exact reference name) ---
    host("srdiff+rrdb_unlocked", "srdiff", "srdiff",
         bs=16, vbs=32, n_iter=200000, months=[1], lock=False)

    # --- test.json (reference smoke config: tiny n_iter srdiff run) ---
    cfg = base("test", "srdiff")
    cfg["data"].update(batch_size=2, val_batch_size=2,
                      train_min_date="2012-01-01-00",
                      train_max_date="2016-01-01-00",
                      val_min_date="2015-01-01-00",
                      val_max_date="2017-01-01-00",
                      months_subset=[1])
    cfg["data"]["transform_groups"] = {"january": [1]}
    cfg["train"].update(n_iter=10, val_freq=10)
    cfg["model"]["pretrained_model"].update(
        model_path="pretrained_models/pretrain_RRDBNet_E26",
        lock_weights=True, hidden_size=64, num_block=17,
    )
    d = ROOT
    with open(d / "test.json", "w") as f:
        json.dump(cfg, f, indent=2)

    n = sum(1 for _ in ROOT.rglob("*.json"))
    print(f"config corpus: {n} experiment configs under {ROOT}")


if __name__ == "__main__":
    main()
