"""Data layer tests: store, date index, scalers (Welford exactness), pipeline."""

import numpy as np
import pytest

from srewd_tpu.data.pipeline import DataHandler
from srewd_tpu.data.scalers import (
    MonthlyScalerSet,
    WelfordAccumulator,
    fit_monthly_scalers,
)
from srewd_tpu.data.store import WeatherStore, make_synthetic_weatherbench
from srewd_tpu.data.timeindex import (
    format_date,
    hourly_range,
    month_to_group,
    months_of,
    parse_date,
    select_months,
    validate_groups,
)


@pytest.fixture(scope="module")
def dataroot(tmp_path_factory):
    root = tmp_path_factory.mktemp("wb")
    # 2 months spanning a year boundary exercises month subsetting/grouping
    return make_synthetic_weatherbench(
        str(root),
        min_date="2016-12-25-00",
        max_date="2017-01-08-00",
        lr_shape=(8, 16),
        hr_shape=(32, 64),
    )


class TestTimeIndex:
    def test_parse_format_roundtrip(self):
        ts = parse_date("2017-01-02-13")
        assert format_date(ts) == "2017-01-02-13"

    def test_hourly_range_excludes_max(self):
        ts = hourly_range("2017-01-01-00", "2017-01-02-00")
        assert len(ts) == 24
        assert format_date(ts[-1]) == "2017-01-01-23"

    def test_months_of(self):
        ts = hourly_range("2016-12-31-22", "2017-01-01-02")
        np.testing.assert_array_equal(months_of(ts), [12, 12, 1, 1])

    def test_select_months(self):
        ts = hourly_range("2016-12-30-00", "2017-01-03-00")
        jan = select_months(ts, [1])
        assert np.all(months_of(jan) == 1)
        assert len(jan) == 48

    def test_group_validation(self):
        validate_groups([1, 2], [[1], [2, 3]])
        with pytest.raises(ValueError):
            validate_groups([1, 4], [[1], [2, 3]])
        with pytest.raises(ValueError):
            validate_groups([1], [[1], [1, 2]])
        assert month_to_group([[12], [1]]) == {12: 0, 1: 1}


class TestStore:
    def test_scan_and_read(self, dataroot):
        store = WeatherStore(f"{dataroot}/hr/t2m")
        assert store.time_variate
        assert len(store) == 14 * 24
        x = store.read("2017-01-01-05")
        assert x.shape == (32, 64, 1)
        assert x.dtype == np.float32
        assert 200 < x.mean() < 330  # Kelvin-ish

    def test_read_many_matches_read(self, dataroot):
        store = WeatherStore(f"{dataroot}/lr/t2m")
        ts = hourly_range("2017-01-01-00", "2017-01-01-05")
        bulk = store.read_many(ts)
        assert bulk.shape == (5, 8, 16, 1)
        for i, t in enumerate(ts):
            np.testing.assert_array_equal(bulk[i], store.read(t))

    def test_coords(self, dataroot):
        store = WeatherStore(f"{dataroot}/hr/t2m")
        assert store.coord_values("lat").shape == (32,)
        assert store.coord_values("lon").shape == (64,)
        assert store.channels == 1


class TestWelford:
    def test_exact_vs_direct(self):
        rng = np.random.default_rng(0)
        data = rng.standard_normal((100, 4, 6, 2)) * 7 + 3
        acc = WelfordAccumulator(axis=(0, 1, 2))
        for lo in range(0, 100, 13):  # uneven chunks
            acc.update(data[lo : lo + 13])
        mean, std = acc.finalize(unbiased=True)
        want_mean = data.mean(axis=(0, 1, 2))
        want_std = data.std(axis=(0, 1, 2), ddof=1)
        np.testing.assert_allclose(mean.ravel(), want_mean, rtol=1e-12)
        np.testing.assert_allclose(std.ravel(), want_std, rtol=1e-12)

    def test_local_axes(self):
        rng = np.random.default_rng(1)
        data = rng.standard_normal((50, 4, 6, 1))
        acc = WelfordAccumulator(axis=(0,))
        acc.update(data[:20])
        acc.update(data[20:])
        mean, std = acc.finalize()
        np.testing.assert_allclose(mean, data.mean(axis=0, keepdims=True)[0], rtol=1e-12)
        np.testing.assert_allclose(std, data.std(axis=0, ddof=1, keepdims=True)[0], rtol=1e-12)


class TestScalers:
    def test_fit_global_per_group(self, dataroot):
        store = WeatherStore(f"{dataroot}/hr/t2m")
        sset = fit_monthly_scalers(
            store, "2016-12-25-00", "2017-01-08-00", [12, 1], [[12], [1]],
            kind="GlobalStandardScaling",
        )
        # direct recomputation for December
        ts = hourly_range("2016-12-25-00", "2017-01-01-00")
        dec = store.read_many(ts)
        np.testing.assert_allclose(
            sset.mean[12].ravel(), dec.mean(axis=(0, 1, 2)), rtol=1e-5
        )
        np.testing.assert_allclose(
            sset.std[12].ravel(), dec.std(axis=(0, 1, 2), ddof=1), rtol=1e-4
        )
        # group mapping: month 1 stats differ from month 12 stats
        assert not np.allclose(sset.mean[1], sset.mean[12])

    def test_transform_inverse_roundtrip(self, dataroot):
        store = WeatherStore(f"{dataroot}/hr/t2m")
        sset = fit_monthly_scalers(
            store, "2016-12-25-00", "2017-01-08-00", None,
            [list(range(1, 13))], kind="GlobalStandardScaling",
        )
        batch = store.read_many(hourly_range("2016-12-26-00", "2016-12-26-04"))
        months = np.array([12] * 4)
        z = sset.transform(batch, months)
        back = sset.inverse(z, months)
        np.testing.assert_allclose(back, batch, rtol=1e-4)
        assert abs(z.mean()) < 3.0 and z.std() < 5.0

    def test_cache(self, dataroot, tmp_path):
        store = WeatherStore(f"{dataroot}/lr/t2m")
        kw = dict(min_date="2017-01-01-00", max_date="2017-01-05-00",
                  months_subset=[1], groups=[[1]], cache_dir=str(tmp_path))
        s1 = fit_monthly_scalers(store, **kw)
        assert len(list(tmp_path.iterdir())) == 1
        s2 = fit_monthly_scalers(store, **kw)
        np.testing.assert_array_equal(s1.mean, s2.mean)

    def test_identity(self):
        s = MonthlyScalerSet.identity_set()
        x = np.random.default_rng(0).standard_normal((3, 4, 4, 1)).astype(np.float32)
        np.testing.assert_array_equal(s.transform(x, np.array([1, 2, 3])), x)


class TestDataHandler:
    def test_process_and_batches(self, dataroot):
        dh = DataHandler(
            dataroot=dataroot,
            variables=["t2m"],
            months_subset=[12, 1],
            groups=[[12], [1]],
            train_min_date="2016-12-25-00",
            train_max_date="2017-01-05-00",
            val_min_date="2017-01-05-00",
            val_max_date="2017-01-08-00",
            train_batch_size=4,
            val_batch_size=8,
        ).process_data()

        assert dh.steps_per_epoch("train") == (11 * 24) // 4
        b = next(dh.train_batches(epoch=0))
        assert b["HR"].shape == (4, 32, 64, 1)
        assert b["LR"].shape == (4, 8, 16, 1)
        assert b["months"].shape == (4,)
        # normalized data is roughly standard
        assert abs(b["HR"].mean()) < 3.0

        vb = next(dh.val_batches())
        assert vb["HR"].shape == (8, 32, 64, 1)

    def test_shuffle_determinism_and_epoch_variation(self, dataroot):
        dh = DataHandler(
            dataroot=dataroot, variables=["t2m"],
            train_min_date="2017-01-01-00", train_max_date="2017-01-05-00",
            val_min_date="2017-01-05-00", val_max_date="2017-01-06-00",
            train_batch_size=4,
        ).process_data()
        a = next(dh.train_batches(epoch=0))["HR"]
        b = next(dh.train_batches(epoch=0))["HR"]
        c = next(dh.train_batches(epoch=1))["HR"]
        np.testing.assert_array_equal(a, b)
        assert not np.array_equal(a, c)

    def test_get_data_by_date_and_inverse(self, dataroot):
        dh = DataHandler(
            dataroot=dataroot, variables=["t2m"],
            train_min_date="2017-01-01-00", train_max_date="2017-01-05-00",
            val_min_date="2017-01-05-00", val_max_date="2017-01-08-00",
        ).process_data()
        b = dh.get_data_by_date("2017-01-06-03")
        assert b["HR"].shape[0] == 1
        store = WeatherStore(f"{dataroot}/hr/t2m")
        raw = store.read("2017-01-06-03")
        inv = dh.inverse_transform({"HR": b["HR"]}, b["months"])
        np.testing.assert_allclose(inv["HR"][0], raw, rtol=1e-4)

    def test_host_sharding_partitions(self, dataroot):
        kw = dict(
            dataroot=dataroot, variables=["t2m"],
            train_min_date="2017-01-01-00", train_max_date="2017-01-03-00",
            val_min_date="2017-01-05-00", val_max_date="2017-01-06-00",
        )
        full = DataHandler(**kw).process_data().train_timestamps
        parts = [
            DataHandler(**kw, process_index=i, process_count=4)
            .process_data()
            .train_timestamps
            for i in range(4)
        ]
        merged = np.sort(np.concatenate(parts))
        np.testing.assert_array_equal(merged, np.sort(full))


class TestLeadTimeAndDelays:
    """Forecasting offsets (reference TimeVariateData lead_time/delays,
    datasets.py:121-132, 176-177, 297-310; builder always passes 0/None)."""

    def test_lead_time_shifts_reads(self, dataroot):
        from srewd_tpu.data.pipeline import DataHandler

        base = DataHandler(
            dataroot=dataroot, variables=["t2m"],
            train_min_date="2017-01-01-00", train_max_date="2017-01-03-00",
            val_min_date="2017-01-03-00", val_max_date="2017-01-04-00",
            train_batch_size=4, transformation="IdentityTransform",
        ).process_data()
        lead = DataHandler(
            dataroot=dataroot, variables=["t2m"],
            train_min_date="2017-01-01-00", train_max_date="2017-01-03-00",
            val_min_date="2017-01-03-00", val_max_date="2017-01-04-00",
            train_batch_size=4, transformation="IdentityTransform",
            lead_time=3,
        ).process_data()
        ts = base.train_timestamps[:4]
        b0 = base.assemble(ts + np.timedelta64(3, "h"))
        b1 = lead.assemble(ts)
        np.testing.assert_array_equal(b0["HR"], b1["HR"])
        # months key from the BASE timestamp
        np.testing.assert_array_equal(
            b1["months"], base.assemble(ts)["months"]
        )

    def test_delays_concat_channels(self, dataroot):
        from srewd_tpu.data.pipeline import DataHandler

        dh = DataHandler(
            dataroot=dataroot, variables=["t2m"],
            train_min_date="2017-01-01-00", train_max_date="2017-01-03-00",
            val_min_date="2017-01-03-00", val_max_date="2017-01-04-00",
            train_batch_size=4, transformation="IdentityTransform",
            delays=[1, 2],
        ).process_data()
        ts = dh.train_timestamps[:2]
        b = dh.assemble(ts)
        assert b["HR"].shape[-1] == 3  # delays [0, 1, 2] channel-concat
        plain = DataHandler(
            dataroot=dataroot, variables=["t2m"],
            train_min_date="2017-01-01-00", train_max_date="2017-01-03-00",
            val_min_date="2017-01-03-00", val_max_date="2017-01-04-00",
            train_batch_size=4, transformation="IdentityTransform",
        ).process_data()
        np.testing.assert_array_equal(
            b["HR"][..., 1], plain.assemble(ts + np.timedelta64(1, "h"))["HR"][..., 0]
        )

    def test_delays_must_be_unique(self, dataroot):
        from srewd_tpu.data.pipeline import DataHandler

        with pytest.raises(ValueError):
            DataHandler(
                dataroot=dataroot, variables=["t2m"],
                train_min_date="2017-01-01-00", train_max_date="2017-01-03-00",
                delays=[1, 1],
            )

    def test_index_respects_offsets(self, dataroot):
        from srewd_tpu.data.pipeline import DataHandler

        dh = DataHandler(
            dataroot=dataroot, variables=["t2m"],
            train_min_date="2017-01-01-00", train_max_date="2017-01-05-00",
            val_min_date=None, val_max_date=None,
            transformation="IdentityTransform", lead_time=6,
        ).process_data()
        last = dh.train_timestamps[-1] + np.timedelta64(6, "h")
        from srewd_tpu.data.store import WeatherStore
        import os as _os

        st = WeatherStore(_os.path.join(dataroot, "hr", "t2m"))
        assert last <= st.timestamps[-1]


class TestMultiVariable:
    """Channel-wise variable concat in config order (_form_batch parity)."""

    def test_two_variables_concat_and_inverse(self, tmp_path):
        from srewd_tpu.data.pipeline import DataHandler
        from srewd_tpu.data.store import make_synthetic_weatherbench

        root = make_synthetic_weatherbench(
            str(tmp_path / "wb2"), "2017-01-01-00", "2017-01-03-00",
            variables=("t2m", "z500"), lr_shape=(8, 16), hr_shape=(16, 32),
        )
        dh = DataHandler(
            dataroot=root, variables=["t2m", "z500"],
            train_min_date="2017-01-01-00", train_max_date="2017-01-02-00",
            val_min_date="2017-01-02-00", val_max_date="2017-01-03-00",
            train_batch_size=4,
        ).process_data()
        b = next(iter(dh.train_batches(0)))
        assert b["HR"].shape[-1] == 2 and b["LR"].shape[-1] == 2

        # channel order == config order
        dh1 = DataHandler(
            dataroot=root, variables=["t2m"],
            train_min_date="2017-01-01-00", train_max_date="2017-01-02-00",
            val_min_date="2017-01-02-00", val_max_date="2017-01-03-00",
            train_batch_size=4,
        ).process_data()
        b1 = next(iter(dh1.train_batches(0)))
        np.testing.assert_allclose(b["HR"][..., :1], b1["HR"], rtol=1e-6)

        # inverse restores Kelvin for both channels
        inv = dh.inverse_transform({"HR": b["HR"]}, b["months"])
        assert 200 < float(np.mean(inv["HR"])) < 350

    def test_constant_variable_through_pipeline(self, tmp_path):
        """Constant fields (reference ConstantData, datasets.py:468-623) join
        a variable group end-to-end: index, assemble, normalize, inverse."""
        from srewd_tpu.data.pipeline import DataHandler
        from srewd_tpu.data.store import WeatherStore, make_synthetic_weatherbench

        root = make_synthetic_weatherbench(
            str(tmp_path / "wbc"), "2017-01-01-00", "2017-01-03-00",
            variables=("t2m",), lr_shape=(8, 16), hr_shape=(16, 32),
            constants=("orography",),
        )
        dh = DataHandler(
            dataroot=root, variables=["t2m", "orography"],
            train_min_date="2017-01-01-00", train_max_date="2017-01-02-00",
            val_min_date="2017-01-02-00", val_max_date="2017-01-03-00",
            train_batch_size=4,
        ).process_data()
        # constant store must not restrict the time index
        assert len(dh.train_timestamps) == 24
        b = next(iter(dh.train_batches(0)))
        assert b["HR"].shape == (4, 16, 32, 2) and b["LR"].shape == (4, 8, 16, 2)
        # the constant channel is identical across the batch
        const_ch = b["HR"][..., 1]
        np.testing.assert_array_equal(const_ch, np.broadcast_to(const_ch[:1], const_ch.shape))
        assert np.all(np.isfinite(b["HR"]))
        # normalized: the single-fit global scaler standardizes spatially
        assert abs(float(const_ch[0].mean())) < 1e-3
        assert abs(float(const_ch[0].std()) - 1.0) < 0.1
        # inverse restores the raw constant field
        inv = dh.inverse_transform({"HR": b["HR"]}, b["months"])
        raw = WeatherStore(f"{root}/hr/orography").read(None)
        np.testing.assert_allclose(inv["HR"][0, ..., 1], raw[..., 0], rtol=1e-4, atol=1e-2)
        # val batches work too (same fitted transforms)
        vb = next(iter(dh.val_batches()))
        assert vb["HR"].shape[-1] == 2

    def test_constant_local_scaling_rejected(self, tmp_path):
        """LocalStandardScaling over a single constant sample is undefined
        (NaN in the reference); we fail loudly instead."""
        from srewd_tpu.data.pipeline import DataHandler
        from srewd_tpu.data.store import make_synthetic_weatherbench

        root = make_synthetic_weatherbench(
            str(tmp_path / "wbl"), "2017-01-01-00", "2017-01-02-00",
            variables=("t2m",), lr_shape=(8, 16), hr_shape=(16, 32),
            constants=("orography",),
        )
        with pytest.raises(ValueError, match="constant"):
            DataHandler(
                dataroot=root, variables=["t2m", "orography"],
                transformation="LocalStandardScaling",
                train_min_date="2017-01-01-00", train_max_date="2017-01-02-00",
                val_min_date="2017-01-01-00", val_max_date="2017-01-02-00",
            ).process_data()


class TestGrainPipeline:
    """Optional grain backend must match DataHandler batching semantics."""

    def _dh(self, dataroot):
        from srewd_tpu.data.pipeline import DataHandler

        return DataHandler(
            dataroot=dataroot, variables=["t2m"],
            train_min_date="2017-01-01-00", train_max_date="2017-01-03-00",
            val_min_date="2017-01-03-00", val_max_date="2017-01-04-00",
            train_batch_size=4, val_batch_size=4, shuffle=False,
        ).process_data()

    def test_matches_datahandler_batches(self, dataroot):
        pytest.importorskip("grain")
        from srewd_tpu.data.grain_pipeline import grain_batches

        dh = self._dh(dataroot)
        ours = list(dh.val_batches())
        theirs = list(grain_batches(dh, split="val", worker_count=0))
        assert len(ours) == len(theirs)
        for a, b in zip(ours, theirs):
            np.testing.assert_allclose(a["HR"], b["HR"], rtol=1e-6)
            np.testing.assert_allclose(a["LR"], b["LR"], rtol=1e-6)
            np.testing.assert_array_equal(a["months"], b["months"])

    def test_shuffle_varies_by_epoch(self, dataroot):
        pytest.importorskip("grain")
        from srewd_tpu.data.grain_pipeline import grain_batches

        dh = self._dh(dataroot)
        dh.shuffle = True
        e0 = next(iter(grain_batches(dh, epoch=0)))["HR"]
        e1 = next(iter(grain_batches(dh, epoch=1)))["HR"]
        assert not np.allclose(e0, e1)


class TestSyntheticSpectrum:
    """The spectrally-realistic synthetic mode (store.make_synthetic_weatherbench
    spectrum='t2m') — replaces r3's flat-then-abrupt tile texture with a red
    power-law anomaly + tanh fronts, both band-limited to the LR Nyquist so
    the HR detail stays deterministically recoverable from LR."""

    def test_powerlaw_fields_statistics(self):
        from srewd_tpu.data.store import _powerlaw_fields

        rng = np.random.default_rng(0)
        h, w, cutoff = 64, 128, 0.125
        f = _powerlaw_fields(rng, 4, h, w, alpha=3.0, cutoff=cutoff)
        assert f.shape == (4, h, w)
        np.testing.assert_allclose(f.std(axis=(1, 2)), 1.0, atol=1e-4)
        spec = np.abs(np.fft.rfft2(f)) ** 2
        ky = np.fft.fftfreq(h)[:, None]
        kx = np.fft.rfftfreq(w)[None, :]
        k = np.hypot(ky, kx)
        # band-limited: no power beyond the cutoff
        assert spec[:, k > cutoff].max() < 1e-12 * spec.max()
        # red: the lowest-k band carries far more power than the band below
        # the cutoff
        lo = spec[:, (k > 0) & (k < 0.02)].mean()
        hi = spec[:, (k > 0.08) & (k <= cutoff)].mean()
        assert lo > 30 * hi

    def test_t2m_mode_tree(self, tmp_path):
        from srewd_tpu.data.store import WeatherStore, make_synthetic_weatherbench

        root = make_synthetic_weatherbench(
            str(tmp_path / "d"), "2017-01-01-00", "2017-01-01-06",
            lr_shape=(16, 32), hr_shape=(64, 128), spectrum="t2m",
        )
        hr = WeatherStore(f"{root}/hr/t2m")
        lr = WeatherStore(f"{root}/lr/t2m")
        a = hr.read("2017-01-01-03")
        b = lr.read("2017-01-01-03")
        assert a.shape == (64, 128, 1) and b.shape == (16, 32, 1)
        # LR is the exact 4x block mean of HR (the learnability contract)
        block = a[..., 0].reshape(16, 4, 32, 4).mean(axis=(1, 3))
        np.testing.assert_allclose(b[..., 0], block, rtol=1e-5)
        # Kelvin scale preserved
        assert 220 < a.mean() < 330

    def test_t2m_sharper_than_tiles_blocks(self, tmp_path):
        """Front sharpening: the t2m mode's HR carries sub-LR-grid gradient
        structure a bicubic upsample of its own LR cannot reproduce."""
        import jax.numpy as jnp

        from srewd_tpu.data.store import WeatherStore, make_synthetic_weatherbench
        from srewd_tpu.ops.resize import bicubic_up4

        root = make_synthetic_weatherbench(
            str(tmp_path / "d2"), "2017-01-01-00", "2017-01-01-02",
            lr_shape=(16, 32), hr_shape=(64, 128), spectrum="t2m", seed=3,
        )
        hr = WeatherStore(f"{root}/hr/t2m").read("2017-01-01-01")
        lr = WeatherStore(f"{root}/lr/t2m").read("2017-01-01-01")
        up = np.asarray(bicubic_up4(jnp.asarray(lr)[None]))[0]
        resid = hr[..., 0] - up[..., 0]
        assert resid.std() > 0.15  # bicubic provably misses HR detail (Kelvin)

    def test_unknown_spectrum_raises(self, tmp_path):
        import pytest

        from srewd_tpu.data.store import make_synthetic_weatherbench

        with pytest.raises(ValueError):
            make_synthetic_weatherbench(
                str(tmp_path / "d3"), "2017-01-01-00", "2017-01-01-02",
                lr_shape=(8, 16), hr_shape=(32, 64), spectrum="blue",
            )


class TestDisjointDateRanges:
    """add_data_by_date parity: extra (min, max) ranges unioned into the
    index (reference data/datasets.py:210-255, IntervalTree merging)."""

    def test_union_hourly_ranges(self):
        from srewd_tpu.data.timeindex import hourly_range, union_hourly_ranges

        a = union_hourly_ranges([
            ("2017-01-01-00", "2017-01-01-06"),
            ("2017-01-02-00", "2017-01-02-03"),
        ])
        assert len(a) == 9
        assert np.all(np.diff(a).astype(int) > 0)  # sorted, unique
        # overlapping spans coalesce
        b = union_hourly_ranges([
            ("2017-01-01-00", "2017-01-01-06"),
            ("2017-01-01-03", "2017-01-01-09"),
        ])
        np.testing.assert_array_equal(
            b, hourly_range("2017-01-01-00", "2017-01-01-09"))

    def test_handler_extra_train_ranges(self, tmp_path):
        from srewd_tpu.data.pipeline import DataHandler
        from srewd_tpu.data.store import make_synthetic_weatherbench

        root = make_synthetic_weatherbench(
            str(tmp_path / "d"), "2017-01-01-00", "2017-01-05-00",
            lr_shape=(8, 16), hr_shape=(32, 64),
        )
        base = dict(
            dataroot=root, variables=["t2m"], train_batch_size=2,
            train_min_date="2017-01-01-00", train_max_date="2017-01-02-00",
        )
        dh0 = DataHandler(**base).process_data()
        dh1 = DataHandler(
            **base,
            train_date_ranges=[["2017-01-03-00", "2017-01-04-00"]],
        ).process_data()
        assert len(dh1.train_timestamps) == len(dh0.train_timestamps) + 24
        # the merged range contributes to the fitted scaler stats
        assert not np.allclose(
            dh1.batch_scalers["hr"].mean, dh0.batch_scalers["hr"].mean)
        # batches assemble across the disjoint spans
        batch = next(iter(dh1.train_batches(0)))
        assert batch["HR"].shape == (2, 32, 64, 1)


class TestDeviceDataset:
    """HBM-resident split cache (data/device_cache.py): batch stream must be
    bit-identical to DataHandler's streaming path — same seeded per-epoch
    shuffle, same drop_last, same month-keyed normalization."""

    def test_matches_streaming_batches(self, dataroot):
        from srewd_tpu.data.device_cache import DeviceDataset

        dh = DataHandler(
            dataroot=dataroot, variables=["t2m"],
            months_subset=[12, 1], groups=[[12], [1]],
            train_min_date="2016-12-25-00", train_max_date="2017-01-02-00",
            val_min_date="2017-01-05-00", val_max_date="2017-01-06-00",
            train_batch_size=4,
        ).process_data()
        cache = DeviceDataset(dh, "train", chunk=7)  # non-divisor chunk
        assert cache.nbytes > 0
        for epoch in (0, 1):
            stream = list(dh.train_batches(epoch=epoch))
            cached = list(cache.batches(epoch=epoch))
            assert len(stream) == len(cached)
            for s, c in zip(stream, cached):
                np.testing.assert_array_equal(s["HR"], np.asarray(c["HR"]))
                np.testing.assert_array_equal(s["LR"], np.asarray(c["LR"]))
                np.testing.assert_array_equal(s["months"], c["months"])

    def test_val_split_unshuffled(self, dataroot):
        from srewd_tpu.data.device_cache import DeviceDataset

        dh = DataHandler(
            dataroot=dataroot, variables=["t2m"],
            months_subset=[12, 1], groups=[[12], [1]],
            train_min_date="2016-12-25-00", train_max_date="2017-01-02-00",
            val_min_date="2017-01-05-00", val_max_date="2017-01-07-00",
            train_batch_size=4, val_batch_size=8,
        ).process_data()
        cache = DeviceDataset(dh, "val")
        stream = list(dh.val_batches())
        cached = list(cache.batches(epoch=3))  # epoch ignored when unshuffled
        assert len(stream) == len(cached)
        for s, c in zip(stream, cached):
            np.testing.assert_array_equal(s["HR"], np.asarray(c["HR"]))
