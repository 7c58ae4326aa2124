#!/usr/bin/env python
"""Generate a synthetic WeatherBench npy tree for demos/benches/tests.

    python scripts/make_synthetic_data.py --root /tmp/srewd_data \
        --min-date 2017-01-01-00 --max-date 2017-02-01-00
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from srewd_tpu.data.store import make_synthetic_weatherbench  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="/tmp/srewd_data")
    p.add_argument("--min-date", default="2017-01-01-00")
    p.add_argument("--max-date", default="2017-02-01-00")
    p.add_argument("--lr", type=int, nargs=2, default=(32, 64))
    p.add_argument("--hr", type=int, nargs=2, default=(128, 256))
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()
    root = make_synthetic_weatherbench(
        args.root, args.min_date, args.max_date,
        lr_shape=tuple(args.lr), hr_shape=tuple(args.hr), seed=args.seed,
    )
    print(f"wrote synthetic WeatherBench tree at {root}")


if __name__ == "__main__":
    main()
