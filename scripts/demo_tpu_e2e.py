#!/usr/bin/env python
"""Real-problem-size end-to-end demo on the default (TPU) platform.

Synthetic WeatherBench tree at the reference size (t2m 32x64 -> 128x256),
full-size sr3 UNet, driven through the real CLIs: short train run with a
validation pass (T_val reduced for wall-clock), then date-targeted sampling
from the checkpoint. Proves the data pipeline + trainer host loop + scan
sampler on real hardware, not just the jitted kernels.

    python scripts/demo_tpu_e2e.py [--iters 30] [--tval 100]
"""

import argparse
import json
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run(cmd):
    print("+", " ".join(map(str, cmd)), flush=True)
    subprocess.run(cmd, check=True, cwd=REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--tval", type=int, default=100)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    work = Path(tempfile.mkdtemp(prefix="srewd_tpu_demo_"))
    dataroot = work / "data"
    run([sys.executable, "scripts/make_synthetic_data.py", "--root", str(dataroot),
         "--min-date", "2017-01-01-00", "--max-date", "2017-01-11-00"])

    cfg = json.loads((REPO / "configs/experiment_configs/sr3/sr3_base_train.json")
                     .read_text())
    cfg["name"] = "tpu_demo"
    cfg["path"]["experiments_folder_path"] = str(work)
    cfg["data"].update(dataroot=str(dataroot), batch_size=args.batch,
                       val_batch_size=args.batch,
                       train_min_date="2017-01-01-00",
                       train_max_date="2017-01-09-00",
                       val_min_date="2017-01-09-00",
                       val_max_date="2017-01-11-00")
    cfg["model"]["unet"]["dropout"] = 0.0
    cfg["model"]["beta_schedule"]["val"]["n_timestep"] = args.tval
    cfg["train"].update(n_iter=args.iters, val_freq=args.iters,
                        full_val_freq=10 * args.iters,  # 1-batch validation
                        save_checkpoint_freq=args.iters, print_freq=10)
    cfg_path = work / "demo.json"
    cfg_path.write_text(json.dumps(cfg, indent=2))

    run([sys.executable, "train.py", "-p", "train", "-c", str(cfg_path)])

    exp = sorted((work / "experiments").glob("tpu_demo_*"))[-1]
    ck = sorted((exp / "checkpoint").glob("I*_E*"))[-1]
    run([sys.executable, "sample.py", "-c", str(cfg_path), "-m", str(ck),
         "-d", "2017-01-10-00", "-o", str(work / "samples")])
    print(f"TPU DEMO OK — {exp}")
    print((exp / "logs" / "train.log").read_text()[-1500:])


if __name__ == "__main__":
    main()
