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

    def test_lmdb_export_requires_lmdb(self, tmp_path):
        try:
            import lmdb  # noqa: F401

            pytest.skip("lmdb present; gating not exercised")
        except ImportError:
            pass
        from srewd_tpu.data.conversions import netcdf_to_lmdb

        with pytest.raises(ImportError, match="lmdb"):
            netcdf_to_lmdb("/tmp/nope.nc", str(tmp_path))


class _FakeVar:
    """Minimal xarray.DataArray stand-in: dims / ["time"].values / isel."""

    def __init__(self, stamps, data):
        self.dims = ("time", "lat", "lon")
        self._stamps = stamps
        self._data = data

    def __getitem__(self, key):
        assert key == "time"
        return type("T", (), {"values": self._stamps})()

    def isel(self, time):
        return type("S", (), {"values": self._data[time]})()


class _FakeTxn:
    def __init__(self, store):
        self._store = store

    def put(self, key, value, overwrite=True):
        if not overwrite and key in self._store:
            return False
        self._store[key] = value
        return True

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


class _FakeEnv:
    def __init__(self, store):
        self.store = store
        self.closed = False

    def begin(self, write=False):
        return _FakeTxn(self.store)

    def close(self):
        self.closed = True


class TestLmdbExport:
    """Exercise netcdf_to_lmdb's record semantics through stub lmdb/xarray
    modules (neither ships in this environment; the converter is an export
    parity surface — reference netcdf_to_lmdb.py:70-88)."""

    def _install_stubs(self, monkeypatch, datasets, store):
        import sys
        import types

        fake_lmdb = types.ModuleType("lmdb")
        fake_lmdb.open = lambda path, map_size=0, writemap=False: _FakeEnv(store)
        fake_xr = types.ModuleType("xarray")
        fake_xr.open_dataset = lambda src: datasets
        fake_xr.open_mfdataset = lambda src: datasets
        monkeypatch.setitem(sys.modules, "lmdb", fake_lmdb)
        monkeypatch.setitem(sys.modules, "xarray", fake_xr)

    def test_timestamp_keyed_records(self, monkeypatch, tmp_path):
        from srewd_tpu.data.conversions import netcdf_to_lmdb

        stamps = np.arange(
            np.datetime64("2017-01-01T00"), np.datetime64("2017-01-01T04"),
            np.timedelta64(1, "h"),
        )
        data = np.arange(4 * 2 * 3, dtype=np.float32).reshape(4, 2, 3)
        ds = type("DS", (), {
            "data_vars": {"t2m": None},
            "__getitem__": lambda self, k: _FakeVar(stamps, data),
        })()
        store = {}
        self._install_stubs(monkeypatch, ds, store)
        n = netcdf_to_lmdb("in.nc", str(tmp_path / "db"), batch_size=3)
        assert n == 4
        assert sorted(store) == [
            b"2017-01-01-00", b"2017-01-01-01", b"2017-01-01-02", b"2017-01-01-03",
        ]
        got = np.frombuffer(store[b"2017-01-01-02"], np.float32).reshape(2, 3)
        np.testing.assert_array_equal(got, data[2])

    def test_duplicate_keys_raise(self, monkeypatch, tmp_path):
        from srewd_tpu.data.conversions import netcdf_to_lmdb

        stamps = np.array([np.datetime64("2017-01-01T00")])
        data = np.zeros((1, 2, 2), np.float32)
        ds = type("DS", (), {
            "data_vars": {"a": None, "b": None},  # same timestamps -> same keys
            "__getitem__": lambda self, k: _FakeVar(stamps, data),
        })()
        store = {}
        self._install_stubs(monkeypatch, ds, store)
        with pytest.raises(ValueError, match="duplicate LMDB key"):
            netcdf_to_lmdb("in.nc", str(tmp_path / "db"))


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
