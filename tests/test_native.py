"""Native fastnpy reader: parity with numpy loads + graceful fallback."""

import os

import numpy as np
import pytest

from srewd_tpu import native
from srewd_tpu.data.store import WeatherStore, make_synthetic_weatherbench


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("no C++ compiler available to build fastnpy")
    return lib


class TestReadBatch:
    def test_f4_parity(self, lib, tmp_path):
        rng = np.random.default_rng(0)
        paths, arrays = [], []
        for i in range(7):
            a = rng.standard_normal((5, 9)).astype(np.float32)
            p = str(tmp_path / f"a{i}.npy")
            np.save(p, a)
            paths.append(p)
            arrays.append(a)
        out = native.read_batch(paths, (5, 9), threads=4)
        assert out is not None
        np.testing.assert_array_equal(out, np.stack(arrays))

    def test_f8_converted(self, lib, tmp_path):
        a = np.arange(12, dtype=np.float64).reshape(3, 4) * 1.5
        p = str(tmp_path / "d.npy")
        np.save(p, a)
        out = native.read_batch([p, p], (3, 4), threads=1)
        assert out is not None and out.dtype == np.float32
        np.testing.assert_allclose(out[0], a.astype(np.float32))

    def test_bad_file_returns_none(self, lib, tmp_path):
        good = str(tmp_path / "g.npy")
        np.save(good, np.zeros((2, 2), np.float32))
        bad = str(tmp_path / "b.npy")
        with open(bad, "wb") as f:
            f.write(b"not an npy file at all")
        assert native.read_batch([good, bad], (2, 2)) is None

    def test_wrong_count_returns_none(self, lib, tmp_path):
        p = str(tmp_path / "w.npy")
        np.save(p, np.zeros((2, 3), np.float32))
        assert native.read_batch([p], (4, 4)) is None

    def test_int_dtype_returns_none(self, lib, tmp_path):
        p = str(tmp_path / "i.npy")
        np.save(p, np.zeros((2, 2), np.int32))
        assert native.read_batch([p], (2, 2)) is None


class TestStoreIntegration:
    def test_read_many_native_matches_python(self, lib, tmp_path):
        root = make_synthetic_weatherbench(
            str(tmp_path / "wb"), "2017-01-01-00", "2017-01-02-00",
            lr_shape=(8, 16), hr_shape=(16, 32),
        )
        store = WeatherStore(os.path.join(root, "hr", "t2m"))
        ts = store.timestamps[:10]
        fast = store.read_many(ts, num_threads=4)
        slow = np.stack([store.read(t) for t in ts])
        np.testing.assert_array_equal(fast, slow)
        assert fast.dtype == np.float32 and fast.shape == (10, 16, 32, 1)
