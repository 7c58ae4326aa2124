"""Checkpointing: orbax-backed save/restore of params, opt state and counters.

Reference equivalent: DDPM.save_network / load_network
(models/diffusion_models/model.py:168-217) writing
checkpoint/I{iter}_E{epoch}_{gen,opt}.pth. Here one orbax checkpoint
directory `I{iter}_E{epoch}` holds the full train state (params, opt_state,
ema_params, step, epoch); `latest()` resolves the newest by step for
resume, and `resume_state` paths from reference-style configs work directly.
"""

from __future__ import annotations

import os
import re

import orbax.checkpoint as ocp

_CKPT_RE = re.compile(r"^I(\d+)_E(\d+)$")


class CheckpointManager:
    def __init__(self, directory: str, keep: int | None = None):
        """keep: retain only the newest `keep` checkpoints after each save
        (rotation for long runs — a full train state is params + opt moments
        + EMA, ~1.5 GB for the 92M-param UNet). None = keep all (reference
        parity: DDPM.save_network never deletes)."""
        self.directory = os.path.abspath(directory)
        self.keep = keep
        os.makedirs(self.directory, exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer()

    def path_for(self, step: int, epoch: int) -> str:
        return os.path.join(self.directory, f"I{step}_E{epoch}")

    def save(self, state: dict, step: int, epoch: int) -> str:
        """state: pytree dict (params/opt_state/... + scalars)."""
        path = self.path_for(step, epoch)
        self._ckpt.save(path, state, force=True)
        self._ckpt.wait_until_finished()
        if self.keep is not None:
            import shutil

            for _, _, old in self.all_checkpoints()[: -self.keep]:
                if os.path.abspath(old) != os.path.abspath(path):
                    shutil.rmtree(old, ignore_errors=True)
        return path

    def restore(self, path: str, target: dict | None = None) -> dict:
        return self._ckpt.restore(os.path.abspath(path), target)

    def all_checkpoints(self) -> list[tuple[int, int, str]]:
        out = []
        if not os.path.isdir(self.directory):
            return out
        for d in os.listdir(self.directory):
            m = _CKPT_RE.match(d)
            if m and os.path.isdir(os.path.join(self.directory, d)):
                out.append((int(m.group(1)), int(m.group(2)), os.path.join(self.directory, d)))
        return sorted(out)

    def latest(self) -> str | None:
        cps = self.all_checkpoints()
        return cps[-1][2] if cps else None

    @staticmethod
    def parse_counters(path: str) -> tuple[int, int]:
        """I{iter}_E{epoch} -> (iter, epoch); tolerates reference-style names."""
        name = os.path.basename(os.path.normpath(path))
        name = name.replace("_gen.pth", "").replace("_opt.pth", "")
        m = _CKPT_RE.match(name)
        if not m:
            return 0, 0
        return int(m.group(1)), int(m.group(2))
