"""Config system tests: commented JSON, experiment dirs, auto-resume."""

import json
import os

import pytest

from srewd_tpu.configs.config import Config, DataConfig, load_commented_json


def _write_cfg(tmp_path, name="exp1", resume=None, folder=None):
    cfg = {
        "name": name,
        "phase": "train",
        "path": {
            "experiments_folder_path": folder or str(tmp_path),
            "log": "logs", "results": "results", "checkpoint": "checkpoint",
            "resume_state": resume,
        },
        "data": {"transform_groups": {"winter": [12, 1, 2], "summer": [6, 7, 8]}},
    }
    p = tmp_path / f"{name}.json"
    p.write_text("// a comment line\n" + json.dumps(cfg, indent=1))
    return str(p)


class TestConfig:
    def test_comment_stripping_and_group_flatten(self, tmp_path):
        c = Config(_write_cfg(tmp_path), experiment=False)
        assert c.get_opt()["data"]["transform_groups"] == [[12, 1, 2], [6, 7, 8]]

    def test_experiment_dirs_created(self, tmp_path):
        c = Config(_write_cfg(tmp_path))
        opt = c.get_opt()
        for k in ("log", "results", "checkpoint"):
            assert os.path.isdir(opt["path"][k])
        assert f"{os.sep}experiments{os.sep}exp1_" in opt["path"]["log"]

    def test_resume_rederives_root(self, tmp_path):
        root = tmp_path / "experiments" / "exp1_250101_000000"
        ck = root / "checkpoint" / "I500_E2"
        ck.mkdir(parents=True)
        c = Config(_write_cfg(tmp_path, resume=str(ck)))
        assert os.path.abspath(c.experiments_root) == str(root)

    def test_auto_resume_picks_latest_iter(self, tmp_path):
        for run, it in (("exp1_250101_000000", 500), ("exp1_250202_000000", 1500)):
            (tmp_path / "experiments" / run / "checkpoint" / f"I{it}_E3").mkdir(
                parents=True
            )
        c = Config(_write_cfg(tmp_path, resume="auto"))
        assert c.get_opt()["path"]["resume_state"].endswith("I1500_E3")

    def test_auto_resume_ignores_extended_experiment_names(self, tmp_path):
        """'auto' must not resume from a sibling experiment whose name merely
        extends this one (the shipped corpus has such pairs, e.g.
        resdiff+physics_100 vs resdiff+physics_100_eval_500)."""
        (tmp_path / "experiments" / "exp1_eval_500_250101_000000" / "checkpoint"
         / "I9000_E9").mkdir(parents=True)
        (tmp_path / "experiments" / "exp1_250101_000000" / "checkpoint"
         / "I500_E2").mkdir(parents=True)
        c = Config(_write_cfg(tmp_path, resume="auto"))
        assert c.get_opt()["path"]["resume_state"].endswith("I500_E2")

    def test_auto_resume_fresh_when_none(self, tmp_path):
        c = Config(_write_cfg(tmp_path, resume="auto"))
        assert c.get_opt()["path"]["resume_state"] is None
        assert "exp1_" in c.experiments_root


class TestDataConfig:
    def test_defaults(self):
        dc = DataConfig()
        assert dc.datetime_format == "%Y-%m-%d-%H"
        assert dc.temporal_resolution_value == 1

    def test_json_override(self, tmp_path):
        p = tmp_path / "dc.json"
        p.write_text(json.dumps({"datetime_format": "%Y%m%d%H",
                                 "temporal_resolution": {"unit": "h", "value": 3}}))
        dc = DataConfig(str(p))
        assert dc.datetime_format == "%Y%m%d%H"
        assert dc.temporal_resolution_value == 3
