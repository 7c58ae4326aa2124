#!/usr/bin/env python
"""End-to-end drive of the CLIs on synthetic data (the /verify recipe).

Synthetic WeatherBench tree -> tiny train config -> `train.py -p train`
(loss must drop) -> `sample.py -d <date>` from the saved checkpoint ->
assert rendered outputs exist and the inverse-transformed field is in a
plausible Kelvin range.

    python scripts/drive_e2e.py [--keep]
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run(cmd, **kw):
    print("+", " ".join(map(str, cmd)), flush=True)
    return subprocess.run(cmd, check=True, cwd=REPO, **kw)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    work = Path(tempfile.mkdtemp(prefix="srewd_e2e_"))
    dataroot = work / "data"
    run([sys.executable, "scripts/make_synthetic_data.py", "--root", str(dataroot),
         "--min-date", "2017-01-01-00", "--max-date", "2017-01-06-00",
         "--lr", "8", "16", "--hr", "32", "64"])

    cfg = {
        "name": "e2e_drive",
        "phase": "train",
        "path": {"experiments_folder_path": str(work / "experiments"),
                 "log": "logs", "tb_logger": "tb_logger", "results": "results",
                 "checkpoint": "checkpoint", "resume_state": None},
        "data": {
            "name": "WeatherBench", "dataroot": str(dataroot),
            "batch_size": 8, "val_batch_size": 4, "num_workers": 0,
            "use_shuffle": True,
            "train_min_date": "2017-01-01-00", "train_max_date": "2017-01-04-00",
            "transformation": "GlobalStandardScaling",
            "months_subset": [1], "transform_groups": {"january": [1]},
            "val_min_date": "2017-01-04-00", "val_max_date": "2017-01-06-00",
            "variables": ["t2m"], "height": 32,
        },
        "model": {
            "model_name": "diffusion", "architecture": "sr3",
            "finetune_norm": False,
            "unet": {"in_channel": 2, "out_channel": 1, "inner_channel": 16,
                     "norm_groups": 8, "channel_multiplier": [1, 2],
                     "attn_res": [16], "res_blocks": 1, "dropout": 0.0},
            "beta_schedule": {
                "train": {"schedule": "linear", "n_timestep": 30,
                          "linear_start": 1e-6, "linear_end": 0.01},
                "val": {"schedule": "linear", "n_timestep": 30,
                        "linear_start": 1e-6, "linear_end": 0.01}},
            "diffusion": {"image_height": 32, "image_width": 64,
                          "image_channels": 1, "channels": 1, "conditional": True},
            "pretrained_model": {"model_path": None, "lock_weights": True},
        },
        "train": {"save_visualizations": True, "n_iter": 24, "val_freq": 24,
                  "full_val_freq": 24, "save_checkpoint_freq": 24,
                  "print_freq": 8, "val_vis_freq": 1,
                  "optimizer": {"type": "adam", "lr": 0.001},
                  # EMA on: the checkpoint carries ema_params, validation
                  # uses them (use_for_val), and the --use-ema sample below
                  # exercises the full EMA surface
                  "ema_scheduler": {"enabled": True, "ema_decay": 0.99,
                                    "step_start_ema": 0, "use_for_val": True}},
        "wandb": {"project": None, "entity": None},
    }
    cfg_path = work / "e2e.json"
    cfg_path.write_text(json.dumps(cfg, indent=2))

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    run([sys.executable, "train.py", "-p", "train", "-c", str(cfg_path),
         "--platform", "cpu"], env=env)

    # config layout: <experiments_folder_path>/experiments/<name>_<ts>/
    exp_dirs = sorted((work / "experiments" / "experiments").glob("e2e_drive_*"))
    assert exp_dirs, "no experiment dir created"
    ckpts = sorted((exp_dirs[-1] / "checkpoint").glob("I*_E*"))
    assert ckpts, f"no checkpoint written under {exp_dirs[-1]}"
    train_log = (exp_dirs[-1] / "logs" / "train.log").read_text()
    assert "l_pix" in train_log, "train log missing loss lines"

    out_dir = work / "samples"
    run([sys.executable, "sample.py", "-c", str(cfg_path), "-m", str(ckpts[-1]),
         "-d", "2017-01-05-00", "-o", str(out_dir), "--platform", "cpu"], env=env)
    pngs = list(out_dir.rglob("*.png"))
    assert pngs, f"sample.py produced no images under {out_dir}"

    # --- EMA-weighted sampling through the CLI flag ---
    run([sys.executable, "sample.py", "-c", str(cfg_path), "-m", str(ckpts[-1]),
         "-d", "2017-01-05-00", "-o", str(work / "samples_ema"),
         "--use-ema", "--platform", "cpu"], env=env)
    assert list((work / "samples_ema").rglob("*.png")), "ema sample produced no images"

    # --- DDIM fast sampling through the CLI flag ---
    run([sys.executable, "sample.py", "-c", str(cfg_path), "-m", str(ckpts[-1]),
         "-d", "2017-01-05-00", "-o", str(work / "samples_ddim"),
         "--sampler", "ddim", "--ddim-steps", "10", "--platform", "cpu"], env=env)
    assert list((work / "samples_ddim").rglob("*.png")), "ddim sample produced no images"

    # --- AOT export: checkpoint -> artifact -> model-code-free sampling ---
    art = work / "e2e.srexport"
    run([sys.executable, "scripts/export_sampler.py", "-c", str(cfg_path),
         "-m", str(ckpts[-1]), "-o", str(art), "--platform", "cpu"], env=env)
    assert art.exists() and art.stat().st_size > 0, "export wrote no artifact"
    check = (
        "import os; os.environ['JAX_PLATFORMS']='cpu'; "
        "import jax; jax.config.update('jax_platforms','cpu'); "
        "import numpy as np; "
        "from srewd_tpu.serving.export import load_sampler; "
        f"fn = load_sampler({str(art)!r}); "
        "lr = 278 + 8*np.random.default_rng(0).standard_normal((3,8,16,1)).astype('float32'); "
        "sr = np.asarray(fn(lr, months=np.ones(3,'int32'), seed=1)); "
        "assert sr.shape == (3,32,64,1) and np.isfinite(sr).all(), sr.shape; "
        "print('EXPORT ROUNDTRIP OK', sr.shape)"
    )
    run([sys.executable, "-c", check], env=env)

    # --- validation-only phase from the checkpoint (train.py -p val) ---
    vcfg = json.loads(json.dumps(cfg))
    vcfg["name"] = "e2e_val"
    vcfg["path"]["resume_state"] = str(ckpts[-1])
    vcfg_path = work / "e2e_val.json"
    vcfg_path.write_text(json.dumps(vcfg, indent=2))
    run([sys.executable, "train.py", "-p", "val", "-c", str(vcfg_path),
         "--platform", "cpu"], env=env)
    val_log = (exp_dirs[-1] / "logs" / "val.log")
    # val phase re-derives the SAME experiment root from resume_state
    assert val_log.exists() and "RMSE" in val_log.read_text(), "val phase wrote no metrics"

    # --- pretrain.py drive: SimpleCNN, 2 epochs, result plates ---
    pcfg = json.loads(json.dumps(cfg))
    pcfg["name"] = "e2e_pretrain"
    pcfg["model"] = {"name": "SimpleSR", "in_channel": 1, "out_channel": 1}
    pcfg["train"]["epoch"] = 2
    pcfg_path = work / "e2e_pretrain.json"
    pcfg_path.write_text(json.dumps(pcfg, indent=2))
    run([sys.executable, "pretrain.py", "-p", "train", "-c", str(pcfg_path),
         "--platform", "cpu"], env=env)
    pexp = sorted((work / "experiments" / "experiments").glob("e2e_pretrain_*"))
    assert pexp, "no pretrain experiment dir"
    pckpts = list((pexp[-1] / "checkpoint").glob("pretrain_*_E1"))
    assert pckpts, f"no pretrain checkpoint under {pexp[-1]}"
    plates = list((pexp[-1] / "results").glob("result_*.png"))
    assert plates, f"no pretrain result plates under {pexp[-1]}"

    # --- RRDB pretrain -> srdiff handoff (the reference's encoder workflow) ---
    rcfg = json.loads(json.dumps(cfg))
    rcfg["name"] = "e2e_rrdb"
    rcfg["model"] = {"name": "RRDBNet", "in_channel": 1, "out_channel": 1,
                     "hidden_size": 32, "num_block": 2}
    rcfg["train"]["epoch"] = 1
    rcfg_path = work / "e2e_rrdb.json"
    rcfg_path.write_text(json.dumps(rcfg, indent=2))
    run([sys.executable, "pretrain.py", "-p", "train", "-c", str(rcfg_path),
         "--platform", "cpu"], env=env)
    rexp = sorted((work / "experiments" / "experiments").glob("e2e_rrdb_*"))
    rck = sorted((rexp[-1] / "checkpoint").glob("pretrain_*_E0"))
    assert rck, "no rrdb pretrain checkpoint"

    scfg = json.loads(json.dumps(cfg))
    scfg["name"] = "e2e_srdiff"
    scfg["model"]["architecture"] = "srdiff"
    scfg["model"]["unet"]["in_channel"] = 1
    scfg["model"]["pretrained_model"] = {
        "model_path": str(rck[-1]), "lock_weights": True,
        "hidden_size": 32, "num_block": 2,
    }
    scfg["train"].update(n_iter=8, val_freq=8, full_val_freq=8,
                         save_checkpoint_freq=8, print_freq=4)
    scfg_path = work / "e2e_srdiff.json"
    scfg_path.write_text(json.dumps(scfg, indent=2))
    run([sys.executable, "train.py", "-p", "train", "-c", str(scfg_path),
         "--platform", "cpu"], env=env)
    sexp = sorted((work / "experiments" / "experiments").glob("e2e_srdiff_*"))
    assert sexp and list((sexp[-1] / "checkpoint").glob("I*_E*")), "srdiff run failed"

    print(f"E2E DRIVE OK — experiment: {exp_dirs[-1]}, {len(pngs)} images, "
          f"pretrain: {len(plates)} plates, srdiff+rrdb handoff OK")
    if not args.keep:
        import shutil

        shutil.rmtree(work)


if __name__ == "__main__":
    main()
