#!/usr/bin/env python
"""Per-arch sampling bench sweep -> one JSON artifact (VERDICT r2 #6).

Loops bench.py over all five architectures (1000-step DDPM) plus one sr3
DDIM-50 run, each in a FRESH subprocess (isolated jit caches, and one
arch's transient remote-TPU fault cannot poison the rest), and writes the
collected JSON lines as an array to BENCH_ARCHS.json (override with
BENCH_ALL_OUT). The driver-facing bench.py contract (one JSON line) is
unchanged; this records the per-arch numbers that previously lived only in
docs (DESIGN.md §4).

Knobs pass through: BENCH_BATCH / BENCH_T / BENCH_DTYPE / BENCH_REPEATS.
~12 min cold per arch on the shared v5e chip; run with a generous timeout.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNS = [
    {"BENCH_ARCH": a} for a in ("sr3", "resdiff", "phydiff", "srdiff", "physrdiff")
] + [
    {"BENCH_ARCH": "sr3", "BENCH_SAMPLER": "ddim", "BENCH_DDIM_STEPS": "50"},
    {"BENCH_ARCH": "sr3", "BENCH_SAMPLER": "dpm", "BENCH_DDIM_STEPS": "25"},
]


def main():
    # optional arch-subset: `bench_all.py resdiff phydiff` re-measures only
    # those rows and merges them into the existing artifact (tags without a
    # fresh run are carried over), so a targeted refresh doesn't cost the
    # full ~80-minute sweep
    subset = set(sys.argv[1:])
    runs = RUNS
    if subset:
        runs = [
            c for c in RUNS
            if (c.get("BENCH_ARCH", "sr3")
                + (f"-{c['BENCH_SAMPLER']}{c.get('BENCH_DDIM_STEPS', '')}"
                   if c.get("BENCH_SAMPLER") else "")) in subset
            or c.get("BENCH_ARCH", "sr3") in subset and not c.get("BENCH_SAMPLER")
        ]
        if not runs:
            sys.exit(f"no runs match {sorted(subset)}")
    results = []
    for cfg in runs:
        env = dict(os.environ, **cfg)
        sampler = cfg.get("BENCH_SAMPLER")
        tag = cfg.get("BENCH_ARCH", "sr3") + (
            f"-{sampler}{cfg.get('BENCH_DDIM_STEPS', '')}" if sampler else ""
        )
        print(f"[bench_all] {tag} ...", file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        try:
            r = subprocess.run(
                [sys.executable, os.path.join(REPO, "bench.py")],
                env=env, capture_output=True, text=True, timeout=3600, cwd=REPO,
            )
        except subprocess.TimeoutExpired:
            results.append({"run": tag, "error": "timeout"})
            continue
        entry = {"run": tag, "wall_sec": round(time.perf_counter() - t0, 1)}
        if r.returncode != 0:
            entry["error"] = (r.stderr or r.stdout)[-500:]
        else:
            for line in reversed(r.stdout.strip().splitlines()):
                try:
                    entry.update(json.loads(line))
                    break
                except json.JSONDecodeError:
                    continue
        results.append(entry)
        print(f"[bench_all] {tag}: {json.dumps(entry)}", file=sys.stderr, flush=True)

    out_path = os.environ.get("BENCH_ALL_OUT", os.path.join(REPO, "BENCH_ARCHS.json"))
    if subset and os.path.exists(out_path):
        with open(out_path) as f:
            prior = {e.get("run"): e for e in json.load(f)}
        prior.update({e["run"]: e for e in results})
        results = list(prior.values())
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))
    return 0 if all("error" not in e for e in results) else 1


if __name__ == "__main__":
    sys.exit(main())
