"""Error-path guardrails (reference's runtime asserts, SURVEY §4) + utils."""

import json
import os
import time

import numpy as np
import pytest

from srewd_tpu.data.store import WeatherStore, write_variable
from srewd_tpu.data.timeindex import hourly_range


class TestStoreErrors:
    def test_missing_dir(self):
        with pytest.raises(FileNotFoundError):
            WeatherStore("/nonexistent/path/t2m")

    def test_missing_meta(self, tmp_path):
        (tmp_path / "t2m" / "samples").mkdir(parents=True)
        with pytest.raises(FileNotFoundError, match="metadata"):
            WeatherStore(str(tmp_path / "t2m"))

    def test_incomplete_hourly_series_raises(self, tmp_path):
        # write 2 days then delete one hour -> completeness check must fire
        ts = hourly_range("2017-01-01-00", "2017-01-03-00")
        data = np.zeros((len(ts), 4, 8), np.float32)
        write_variable(str(tmp_path), "t2m", data, ts,
                       np.linspace(-90, 90, 4), np.linspace(0, 360, 8, endpoint=False))
        victim = tmp_path / "t2m" / "samples" / "2017" / "2017-01-01-07.npy"
        os.unlink(victim)
        with pytest.raises(ValueError, match="missing hourly"):
            WeatherStore(str(tmp_path / "t2m"))

    def test_empty_samples_raises(self, tmp_path):
        base = tmp_path / "t2m"
        (base / "samples").mkdir(parents=True)
        (base / "meta").mkdir()
        (base / "meta" / "metadata.json").write_text(json.dumps(
            {"name": "t2m", "time_variate": True, "dims": ["lat", "lon"],
             "shape": [4, 8], "coords": []}))
        with pytest.raises(FileNotFoundError, match="no samples"):
            WeatherStore(str(base))


class TestConversionsGated:
    def test_netcdf_requires_xarray(self, tmp_path):
        pytest.importorskip("pytest")  # always true; keep structure uniform
        try:
            import xarray  # noqa: F401

            pytest.skip("xarray present; gating not exercised")
        except ImportError:
            pass
        from srewd_tpu.data.conversions import netcdf_to_npy

        with pytest.raises(ImportError, match="xarray"):
            netcdf_to_npy("/tmp/nope.nc", str(tmp_path))


class TestStepTimer:
    def test_rolling_stats(self):
        from srewd_tpu.utils.profiling import StepTimer

        t = StepTimer(window=8)
        t.start()
        for _ in range(4):
            time.sleep(0.005)
            t.tick()
        s = t.summary()
        assert s["steps_per_sec"] > 0
        assert s["p95_s"] >= s["p50_s"] > 0
        assert "steps/s" in t.summary_str()

    def test_empty_summary(self):
        from srewd_tpu.utils.profiling import StepTimer

        assert StepTimer().summary()["steps_per_sec"] == 0.0
