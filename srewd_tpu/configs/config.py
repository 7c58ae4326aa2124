"""Experiment configuration: commented-JSON parsing + experiment dir layout.

Mirrors the reference schema exactly (SURVEY.md §2.2, configs/config.py):
  * JSON files may carry '//' line comments — stripped per line
    (configs/config.py:82-87).
  * an experiment run creates experiments/<name>_<yymmdd_HHMMSS>/
    {logs, tb_logger, results, checkpoint}; when `path.resume_state` is set
    the experiment root is re-derived from it (configs/config.py:101-117).
  * `data.transform_groups` is flattened from a named dict to a list of
    month groups (configs/config.py:66).

Deviations (documented):
  * no CUDA_VISIBLE_DEVICES / `distributed` string-length flag
    (configs/config.py:92-99 — a latent bug: >1 *characters*); device
    selection is JAX-native. The equivalent knob is `parallel.data_axis`.
"""

from __future__ import annotations

import json
import os
from collections import OrderedDict
from datetime import datetime


def load_commented_json(path: str) -> OrderedDict:
    """Parse JSON allowing '//' line comments (reference convention)."""
    json_str = ""
    with open(path) as f:
        for line in f:
            json_str += line.split("//")[0] + "\n"
    return json.loads(json_str, object_pairs_hook=OrderedDict)


class DataConfig:
    """Data-layout constants (configs/data_config/config.json equivalent)."""

    def __init__(self, json_path: str | None = None):
        defaults = {
            "name": "data_config",
            "datetime_format": "%Y-%m-%d-%H",
            "temporal_resolution": {"unit": "h", "value": 1},
            "directory_name_meta_data": "meta",
            "file_name_meta_data": "metadata",
            "file_name_constant_data": "constant",
            "directory_name_sample_data": "samples",
            "netcdf_extension": ".nc",
            "numpy_extension": ".npy",
        }
        cfg = dict(defaults)
        if json_path:
            cfg.update(load_commented_json(json_path))
        self.config = cfg
        self.name = cfg["name"]
        self.datetime_format = cfg["datetime_format"]
        self.temporal_resolution_unit = cfg["temporal_resolution"]["unit"]
        self.temporal_resolution_value = cfg["temporal_resolution"]["value"]
        self.directory_name_meta_data = cfg["directory_name_meta_data"]
        self.file_name_meta_data = cfg["file_name_meta_data"]
        self.file_name_constant_data = cfg["file_name_constant_data"]
        self.directory_name_sample_data = cfg["directory_name_sample_data"]
        self.netcdf_extension = cfg["netcdf_extension"]
        self.numpy_extension = cfg["numpy_extension"]


def _now_tag() -> str:
    return datetime.now().strftime("%y%m%d_%H%M%S")


class Config:
    """Load an experiment config and (optionally) create its directory tree."""

    def __init__(self, config_path: str, phase: str | None = None, experiment: bool = True):
        self.root = config_path
        self.params = load_commented_json(config_path)
        if phase:
            self.params["phase"] = phase
        self.experiments_root = None
        if experiment:
            self._handle_experiment_dirs()
        tg = self.params.get("data", {}).get("transform_groups")
        if isinstance(tg, dict):
            self.params["data"]["transform_groups"] = list(tg.values())

    def _find_latest_checkpoint(self) -> str | None:
        """Newest I{iter}_E{epoch} checkpoint across this experiment name's
        runs — preemption auto-recovery (resume_state: "auto")."""
        import glob
        import re

        base = self.params.get("path", {}).get("experiments_folder_path") or "."
        pattern = os.path.join(
            base, "experiments", f"{self.params['name']}_*", "checkpoint", "I*_E*"
        )
        # anchored run-dir match: <name>_<yymmdd_HHMMSS> exactly (_now_tag
        # format) — a bare prefix glob would also match sibling experiments
        # whose name extends this one (e.g. resdiff+physics_100 vs
        # resdiff+physics_100_eval_500) and silently resume the wrong run
        run_re = re.compile(
            rf"^{re.escape(self.params['name'])}_\d{{6}}_\d{{6}}$"
        )
        best, best_iter = None, -1
        for p in glob.glob(pattern):
            run_dir = os.path.basename(os.path.dirname(os.path.dirname(p)))
            if not run_re.match(run_dir):
                continue
            m = re.match(r"I(\d+)_E(\d+)$", os.path.basename(p))
            if m and int(m.group(1)) > best_iter:
                best, best_iter = p, int(m.group(1))
        return best

    def _handle_experiment_dirs(self) -> None:
        paths = self.params.get("path", {})
        resume = paths.get("resume_state")
        if resume == "auto":
            resume = self._find_latest_checkpoint()
            paths["resume_state"] = resume  # None -> fresh run below
        if not resume:
            base = paths.get("experiments_folder_path") or "."
            self.experiments_root = os.path.join(
                base, "experiments", f"{self.params['name']}_{_now_tag()}"
            )
        else:
            # resume_state points at .../experiments/<run>/checkpoint/<ckpt>
            self.experiments_root = os.path.dirname(os.path.dirname(os.path.abspath(resume)))
        for key, sub in list(paths.items()):
            if key.startswith("resume") or key.startswith("experiments"):
                continue
            paths[key] = os.path.join(self.experiments_root, sub)
            os.makedirs(paths[key], exist_ok=True)
        paths["experiments_root"] = self.experiments_root

    def get_opt(self) -> dict:
        return self.params

    def get_hyperparameters_as_dict(self) -> dict:
        return self.params


def dict2str(opt: dict, indent_l: int = 1) -> str:
    """Config pretty-printer for the log file (configs/config.py:136-146)."""
    msg = ""
    for k, v in opt.items():
        if isinstance(v, dict):
            msg += " " * (indent_l * 2) + k + ":[\n"
            msg += dict2str(v, indent_l + 1)
            msg += " " * (indent_l * 2) + "]\n"
        else:
            msg += " " * (indent_l * 2) + k + ": " + str(v) + "\n"
    return msg
