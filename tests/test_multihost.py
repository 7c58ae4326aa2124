"""Two-process multi-host SPMD test (scripts/dryrun_multihost.py).

Certifies the SREWD_MULTIHOST path (cli.py): two processes with 4 virtual
CPU devices each jax.distributed.initialize() against a localhost
coordinator, compose the 8-row global batch from per-host 4-row shards
(jax.make_array_from_process_local_data — the DataHandler striding
contract), and the jitted SPMD train step matches the single-process
8-device result. Runs in subprocesses because jax.distributed cannot
initialize inside the already-initialized test interpreter.

Reference equivalent: none (its only parallelism is single-process
nn.DataParallel, networks.py:166-168) — this pins the rebuild's own
multi-host commitment (SURVEY.md §2.8, DESIGN.md §5).
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestMultiHost:
    def test_two_process_matches_single_process(self, tmp_path):
        out = tmp_path / "MULTIHOST.json"
        env = {k: v for k, v in os.environ.items()
               if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
        # generous timeout: three concurrent JAX-compiling processes on an
        # already-loaded CI host can take many minutes (standalone ~4 min)
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts/dryrun_multihost.py"),
             str(out)],
            capture_output=True, text=True, timeout=2400, cwd=REPO, env=env,
        )
        assert r.returncode == 0, (r.stdout[-3000:], r.stderr[-3000:])
        result = json.loads(out.read_text())
        assert result["ok"], result
        assert result["hosts_agree"] and result["loss_match"] and result["params_match"]
        assert len(result["losses_multihost"]) == result["steps"]
