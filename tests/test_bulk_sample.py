"""Bulk date-range sampling CLI (beyond the reference's single-date mode).

Drives `python sample.py --date-range ...` end-to-end on a synthetic
WeatherBench tree: every hour of the window must come back as a per-hour
Kelvin-scale .npy (the padded final device batch trimmed), with a
throughput summary JSON.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from srewd_tpu.data.store import make_synthetic_weatherbench


@pytest.fixture(scope="module")
def env_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("bulk")
    make_synthetic_weatherbench(
        str(root / "data"),
        min_date="2017-01-01-00", max_date="2017-01-03-00",
        lr_shape=(8, 16), hr_shape=(32, 64),
    )
    cfg = {
        "name": "bulk_cli", "phase": "val",
        "path": {"experiments_folder_path": str(root / "exp"),
                 "log": "logs", "tb_logger": "tb", "results": "results",
                 "checkpoint": "checkpoint", "resume_state": None},
        "data": {"name": "WeatherBench", "dataroot": str(root / "data"),
                 "batch_size": 4, "val_batch_size": 4, "num_workers": 0,
                 "use_shuffle": False,
                 "train_min_date": "2017-01-01-00",
                 "train_max_date": "2017-01-02-00",
                 "transformation": "GlobalStandardScaling",
                 "months_subset": [1], "transform_groups": {"january": [1]},
                 "val_min_date": "2017-01-02-00",
                 "val_max_date": "2017-01-03-00",
                 "variables": ["t2m"], "height": 32},
        "model": {"model_name": "diffusion", "architecture": "sr3",
                  "finetune_norm": False,
                  "unet": {"in_channel": 2, "out_channel": 1,
                           "inner_channel": 16, "norm_groups": 8,
                           "channel_multiplier": [1, 2], "attn_res": [16],
                           "res_blocks": 1, "dropout": 0.0},
                  "beta_schedule": {
                      "train": {"schedule": "linear", "n_timestep": 8,
                                "linear_start": 1e-6, "linear_end": 0.01},
                      "val": {"schedule": "linear", "n_timestep": 8,
                              "linear_start": 1e-6, "linear_end": 0.01}},
                  "diffusion": {"image_height": 32, "image_width": 64,
                                "image_channels": 1, "channels": 1,
                                "conditional": True},
                  "pretrained_model": {"model_path": None,
                                       "lock_weights": True}},
        "train": {"optimizer": {"type": "adam", "lr": 1e-3},
                  "ema_scheduler": {"enabled": False}},
        "wandb": {"project": None, "entity": None},
    }
    (root / "cfg.json").write_text(json.dumps(cfg))
    return root


def test_bulk_date_range_cli(env_root):
    out = env_root / "out"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "sample.py"),
         "-c", str(env_root / "cfg.json"), "--platform", "cpu",
         "--date-range", "2017-01-02-00", "2017-01-02-06",
         "--batch-size", "4", "--save-npy", "-o", str(out)],
        capture_output=True, text=True, timeout=580, cwd=repo,
        # single-device CPU: drop the harness's 8-virtual-device XLA_FLAGS
        # (a real user's batch size need not divide 8)
        env=dict(os.environ, JAX_PLATFORMS="cpu", XLA_FLAGS=""),
    )
    assert r.returncode == 0, r.stderr[-3000:]

    # 6 hours -> 6 files (4 + padded-then-trimmed 2), Kelvin scale, HR shape
    names = sorted(os.listdir(out / "sr"))
    assert names == [f"2017-01-02-0{h}.npy" for h in range(6)]
    a = np.load(out / "sr" / names[3])
    assert a.shape == (32, 64, 1)
    assert 200.0 < float(a.mean()) < 330.0  # physical units

    summary = json.loads((out / "summary.json").read_text())
    assert summary["fields"] == 6
    assert summary["fields_per_sec_total"] > 0


def test_bulk_ensemble_cli(env_root):
    """--ensemble N writes per-hour mean + std maps; members must differ
    (each draw gets its own fold of the RNG key)."""
    out = env_root / "out_ens"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "sample.py"),
         "-c", str(env_root / "cfg.json"), "--platform", "cpu",
         "--date-range", "2017-01-02-00", "2017-01-02-04",
         "--batch-size", "4", "--save-npy", "--ensemble", "2",
         "-o", str(out)],
        capture_output=True, text=True, timeout=580, cwd=repo,
        env=dict(os.environ, JAX_PLATFORMS="cpu", XLA_FLAGS=""),
    )
    assert r.returncode == 0, r.stderr[-3000:]
    std = np.load(out / "sr_std" / "2017-01-02-01.npy")
    assert std.shape == (32, 64, 1)
    assert float(std.mean()) > 0.01  # members drew different noise
    summary = json.loads((out / "summary.json").read_text())
    assert summary["ensemble"] == 2 and summary["fields"] == 4
