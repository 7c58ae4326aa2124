#!/usr/bin/env python
"""Render QUALITY_*.json artifacts as a markdown table.

Columns are the stable Kelvin-space metrics (RMSE/MAE/MR; see the
metrics_note inside the artifacts for why PSNR/SSIM are excluded by
default), one row per (sampler, variant), with rmse_vs_bicubic — the
single number the quality story hangs on (<1 beats free interpolation).

    python scripts/summarize_quality.py QUALITY_r04.json [more.json ...]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path


def table(path: str) -> str:
    d = json.loads(Path(path).read_text())
    bic = d["bicubic"]["metrics"]
    lines = [
        f"**{Path(path).name}** — arch={d['arch']} iters={d['iters']} "
        f"batch={d['batch']} val_fields={d['val_fields']} "
        f"spectrum={d.get('spectrum', 'tiles')}"
        + (" (PARTIAL)" if d.get("partial") else ""),
        "",
        "| sampler | RMSE (K) | MAE (K) | MR (K) | vs bicubic |",
        "|---|---|---|---|---|",
        f"| bicubic ×4 | {bic['RMSE']:.4f} | {bic['MAE']:.4f} "
        f"| {bic['MR']:+.4f} | 1.0 |",
    ]
    for label, row in d["samplers"].items():
        m = row["metrics"]
        lines.append(
            f"| {label} | {m['RMSE']:.4f} | {m['MAE']:.4f} "
            f"| {m['MR']:+.4f} | {d['rmse_vs_bicubic'][label]:.3f} |"
        )
    return "\n".join(lines)


if __name__ == "__main__":
    for p in sys.argv[1:] or ["QUALITY_r04.json"]:
        print(table(p))
        print()
