"""Training-layer tests: resume determinism, EMA, SPMD equivalence, metrics.

The reference has no training tests (SURVEY.md §4); these pin the behaviors
its manual workflow relies on: checkpoint/resume reproduces the exact
uninterrupted trajectory, EMA tracks params, and the SPMD 8-device mesh
computes the same step as a single device.
"""

import numpy as np
import optax
import pytest

import jax
import jax.numpy as jnp

from srewd_tpu.diffusion.schedule import Schedule
from srewd_tpu.models.factory import DiffusionModel
from srewd_tpu.models.unet import WeatherUNet
from srewd_tpu.parallel.mesh import make_mesh
from srewd_tpu.training.trainer import DiffusionTrainer

B, H, W = 8, 16, 32


def _model():
    unet = WeatherUNet(
        variant="sr3", out_channel=1, inner_channel=8, norm_groups=4,
        channel_mults=(1, 2), attn_res=(8,), res_blocks=1, dropout=0.0,
        image_height=H, image_width=W, image_channels=1,
    )
    return DiffusionModel(arch="sr3", unet=unet)


def _batch(seed):
    rng = np.random.default_rng(seed)
    return {
        "HR": rng.standard_normal((B, H, W, 1)).astype(np.float32),
        "LR": rng.standard_normal((B, H // 4, W // 4, 1)).astype(np.float32),
        "months": np.ones((B,), np.int32),
    }


def _trainer(ckpt_dir=None, n_devices=1, ema=None):
    sched = Schedule.create("linear", n_timestep=8)
    return DiffusionTrainer(
        model=_model(), schedule_train=sched, schedule_val=sched,
        optimizer=optax.adam(1e-3), mesh=make_mesh(n_devices),
        checkpoint_dir=ckpt_dir, ema_decay=ema, seed=0,
    )


def _leaves(tree):
    return [np.asarray(x) for x in jax.tree.leaves(tree)]


class TestCheckpointResume:
    def test_rotation_keeps_newest_n(self, tmp_path):
        # train.checkpoint_keep: long runs (200k iters, ckpt every 10k) rotate
        # old states instead of accumulating ~1.5 GB each (beyond reference —
        # DDPM.save_network model.py:168-193 never deletes)
        from srewd_tpu.training.checkpoint import CheckpointManager

        cm = CheckpointManager(str(tmp_path), keep=3)
        state = {"w": np.arange(4.0)}
        for step in range(1, 6):
            cm.save(state, step=step * 10, epoch=step)
        kept = [(s, e) for s, e, _ in cm.all_checkpoints()]
        assert kept == [(30, 3), (40, 4), (50, 5)]
        assert cm.latest().endswith("I50_E5")
        # the survivors stay restorable
        got = cm.restore(cm.latest(), {"w": np.zeros(4)})
        np.testing.assert_allclose(got["w"], state["w"])

    def test_resume_reproduces_uninterrupted_run(self, tmp_path):
        # straight run: 5 steps
        t1 = _trainer()
        t1.init_params(_batch(0))
        losses1 = [t1.train_on_batch(_batch(i)) for i in range(5)]

        # interrupted run: 3 steps -> save -> fresh trainer -> resume -> 2 steps
        t2 = _trainer(ckpt_dir=str(tmp_path))
        t2.init_params(_batch(0))
        losses2 = [t2.train_on_batch(_batch(i)) for i in range(3)]
        path = t2.save()
        assert path is not None and "I3_E0" in path

        t3 = _trainer(ckpt_dir=str(tmp_path))
        t3.init_params(_batch(0))  # shapes for restore target
        t3.resume(path)
        assert t3.step == 3
        losses2 += [t3.train_on_batch(_batch(i)) for i in range(3, 5)]

        np.testing.assert_allclose(losses1, losses2, rtol=1e-5)
        for a, b in zip(_leaves(t1.params), _leaves(t3.params)):
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)

    def test_ema_saved_and_restored(self, tmp_path):
        t = _trainer(ckpt_dir=str(tmp_path), ema=0.5)
        t.init_params(_batch(0))
        for i in range(3):
            t.train_on_batch(_batch(i))
        path = t.save()
        t2 = _trainer(ckpt_dir=str(tmp_path), ema=0.5)
        t2.init_params(_batch(0))
        t2.resume(path)
        for a, b in zip(_leaves(t.ema_params), _leaves(t2.ema_params)):
            np.testing.assert_allclose(a, b, rtol=1e-6)


class TestEMA:
    def test_ema_tracks_params(self):
        t = _trainer(ema=0.0)  # decay 0 => EMA == current params
        t.init_params(_batch(0))
        t.train_on_batch(_batch(1))
        for a, b in zip(_leaves(t.ema_params), _leaves(t.params)):
            np.testing.assert_allclose(a, b, rtol=1e-6)

    def test_ema_lags_with_high_decay(self):
        t = _trainer(ema=1.0)  # decay 1 => EMA frozen at init
        t.init_params(_batch(0))
        init = _leaves(t.ema_params)
        for i in range(2):
            t.train_on_batch(_batch(i))
        for a, b in zip(init, _leaves(t.ema_params)):
            np.testing.assert_array_equal(a, b)

    def test_sample_batch_uses_ema_params(self):
        """use_ema=True must sample with the EMA tree, not the raw params
        (VERDICT r2 weak #5: EMA evaluation surface)."""
        t = _trainer(ema=1.0)  # decay 1 => EMA frozen at init
        t.init_params(_batch(0))
        for i in range(2):
            t.train_on_batch(_batch(i))

        # reference trainer frozen at the same init, never trained
        t0 = _trainer()
        t0.init_params(_batch(0))
        t0.step = t.step  # sample keys derive from step — align them

        got_ema = np.asarray(t.sample_batch(_batch(5), use_ema=True))
        want = np.asarray(t0.sample_batch(_batch(5)))
        got_raw = np.asarray(t.sample_batch(_batch(5)))
        np.testing.assert_allclose(got_ema, want, rtol=1e-5, atol=1e-6)
        assert not np.allclose(got_ema, got_raw)

    def test_ema_start_delays_updates(self):
        t = _trainer(ema=0.0)
        t.ema_start = 3
        t.init_params(_batch(0))
        init = _leaves(t.ema_params)
        t.train_on_batch(_batch(1))  # step 1 < ema_start: no update
        for a, b in zip(init, _leaves(t.ema_params)):
            np.testing.assert_array_equal(a, b)


class TestSPMD:
    def test_8dev_matches_1dev(self):
        """The sharded train step computes the same math as single-device."""
        ta = _trainer(n_devices=1)
        tb = _trainer(n_devices=8)
        ta.init_params(_batch(0))
        tb.init_params(_batch(0))
        for a, b in zip(_leaves(ta.params), _leaves(tb.params)):
            np.testing.assert_array_equal(a, b)
        for i in range(3):
            la = ta.train_on_batch(_batch(i))
            lb = tb.train_on_batch(_batch(i))
            assert la == pytest.approx(lb, rel=2e-4)
        for a, b in zip(_leaves(ta.params), _leaves(tb.params)):
            np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-5)

    def test_sample_runs_sharded(self):
        t = _trainer(n_devices=8)
        t.init_params(_batch(0))
        sr = t.sample_batch(_batch(1))
        assert sr.shape == (B, H, W, 1)
        assert bool(jnp.all(jnp.isfinite(sr)))


class TestTensorParallel:
    """Lazy tensor parallelism: conv output channels sharded over the mesh
    'model' axis via placement (parallel.mesh.param_placement); GSPMD
    propagates the sharding and inserts the ICI collectives. The 2-D
    (data=4, model=2) program must hold genuinely sharded state and compute
    the same math as plain DP."""

    def _tp_trainer(self, ckpt_dir=None):
        sched = Schedule.create("linear", n_timestep=8)
        return DiffusionTrainer(
            model=_model(), schedule_train=sched, schedule_val=sched,
            optimizer=optax.adam(1e-3),
            mesh=make_mesh(8, model_parallel=2), seed=0,
            model_shard_min_dim=8, checkpoint_dir=ckpt_dir,
        )

    def test_params_and_moments_actually_sharded(self):
        t = self._tp_trainer()
        t.init_params(_batch(0))
        sharded = [
            p for p in jax.tree.leaves(t.params)
            if "model" in tuple(p.sharding.spec)
        ]
        assert sharded, "no param leaf sharded over 'model'"
        p = max(sharded, key=lambda x: x.size)
        assert p.addressable_shards[0].data.shape[-1] == p.shape[-1] // 2
        # Adam mu/nu mirror param shapes -> shard identically
        assert any(
            "model" in tuple(m.sharding.spec)
            for m in jax.tree.leaves(t.opt_state)
            if hasattr(m, "sharding")
        ), "no optimizer-state leaf sharded over 'model'"

    def test_tp_checkpoint_resume_roundtrip(self, tmp_path):
        t = self._tp_trainer(ckpt_dir=str(tmp_path))
        t.init_params(_batch(0))
        for i in range(2):
            t.train_on_batch(_batch(i))
        path = t.save()
        t2 = self._tp_trainer(ckpt_dir=str(tmp_path))
        t2.init_params(_batch(0))
        t2.resume(path)
        assert t2.step == 2
        # restored tree keeps the TP placement and the exact values
        assert any(
            "model" in tuple(p.sharding.spec)
            for p in jax.tree.leaves(t2.params)
        )
        for a, b in zip(_leaves(t.params), _leaves(t2.params)):
            np.testing.assert_allclose(a, b, rtol=1e-6)

    def test_tp2_matches_dp(self):
        tdp = _trainer(n_devices=8)
        ttp = self._tp_trainer()
        tdp.init_params(_batch(0))
        ttp.init_params(_batch(0))
        for i in range(3):
            ldp = tdp.train_on_batch(_batch(i))
            ltp = ttp.train_on_batch(_batch(i))
            assert ldp == pytest.approx(ltp, rel=2e-4)
        for a, b in zip(_leaves(tdp.params), _leaves(ttp.params)):
            np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-5)


class TestSPMDFlash:
    """Pallas flash kernels under a multi-device mesh (VERDICT r2 #1).

    The flash fwd/bwd kernels are wrapped in jax.shard_map over the mesh
    'data' axis (models/blocks._flash_route) so a sharded program keeps the
    measured single-chip kernel wins instead of silently falling back to
    the chunked XLA path. SREWD_FLASH_INTERPRET=1 routes the kernels in
    Pallas interpret mode so the plumbing runs on the 8 virtual CPU devices.
    """

    def _routed(self):
        from srewd_tpu.models import blocks

        return blocks.flash_route_count

    def test_8dev_flash_train_matches_chunked(self, monkeypatch):
        # chunked-XLA reference trainer (flash off) — trace FIRST, since the
        # env knobs are read at trace time and jit caches per-trainer
        monkeypatch.setenv("SREWD_FLASH_TRAIN", "0")
        tb = _trainer(n_devices=8)
        tb.init_params(_batch(0))
        losses_ref = [tb.train_on_batch(_batch(i)) for i in range(3)]

        monkeypatch.setenv("SREWD_FLASH_TRAIN", "1")
        monkeypatch.setenv("SREWD_FLASH_INTERPRET", "1")
        before = self._routed()
        ta = _trainer(n_devices=8)
        ta.init_params(_batch(0))
        losses = [ta.train_on_batch(_batch(i)) for i in range(3)]
        assert self._routed() > before, "flash kernel did not route"

        np.testing.assert_allclose(losses, losses_ref, rtol=2e-4)
        for a, b in zip(_leaves(ta.params), _leaves(tb.params)):
            np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-5)

    def test_8dev_flash_sampling_parity(self, monkeypatch):
        monkeypatch.setenv("SREWD_FLASH_TRAIN", "0")
        monkeypatch.delenv("SREWD_FLASH_INTERPRET", raising=False)
        tb = _trainer(n_devices=8)
        tb.init_params(_batch(0))
        want = np.asarray(tb.sample_batch(_batch(1)))

        monkeypatch.setenv("SREWD_FLASH_INTERPRET", "1")
        before = self._routed()
        ta = _trainer(n_devices=8)
        ta.init_params(_batch(0))
        got = np.asarray(ta.sample_batch(_batch(1)))
        assert self._routed() > before, "flash kernel did not route"
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_flash_skips_indivisible_batch(self, monkeypatch):
        """Batch not divisible by the data axis -> silent chunked fallback."""
        import math

        from srewd_tpu.models import blocks
        from srewd_tpu.parallel.mesh import make_mesh

        monkeypatch.setenv("SREWD_FLASH_INTERPRET", "1")
        rng = np.random.default_rng(3)
        q, k, v = (
            jnp.asarray(rng.standard_normal((6, 64, 8)), jnp.float32)
            for _ in range(3)
        )
        mesh = make_mesh(8)
        before = blocks.flash_route_count
        with blocks.spmd_mesh(mesh), blocks.inference_attention():
            out = blocks._chunked_attention(q, k, v, 1.0 / math.sqrt(8))
        assert blocks.flash_route_count == before  # 6 % 8 != 0
        assert np.all(np.isfinite(np.asarray(out)))


class TestSPMDLifecycle:
    """Full training lifecycle under a multi-device mesh (VERDICT r2 weak #3):
    checkpoint save/restore of sharded+replicated state, EMA, and a complete
    validation pass — not just the single train step the dryrun certifies."""

    def test_8dev_checkpoint_ema_resume_roundtrip(self, tmp_path):
        # uninterrupted 8-device run with EMA
        t1 = _trainer(n_devices=8, ema=0.5)
        t1.init_params(_batch(0))
        losses1 = [t1.train_on_batch(_batch(i)) for i in range(5)]

        # interrupted: 3 steps -> save sharded state -> fresh 8-dev trainer
        # -> resume -> 2 steps
        t2 = _trainer(ckpt_dir=str(tmp_path), n_devices=8, ema=0.5)
        t2.init_params(_batch(0))
        losses2 = [t2.train_on_batch(_batch(i)) for i in range(3)]
        path = t2.save()
        t3 = _trainer(ckpt_dir=str(tmp_path), n_devices=8, ema=0.5)
        t3.init_params(_batch(0))
        t3.resume(path)
        assert t3.step == 3
        losses2 += [t3.train_on_batch(_batch(i)) for i in range(3, 5)]

        np.testing.assert_allclose(losses1, losses2, rtol=1e-5)
        for a, b in zip(_leaves(t1.params), _leaves(t3.params)):
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
        for a, b in zip(_leaves(t1.ema_params), _leaves(t3.ema_params)):
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)

    class _Handler:
        """Minimal DataHandler surface run_validation needs."""

        def val_batches(self):
            for i in range(2):
                yield _batch(100 + i)

        def inverse_transform(self, images, months):
            # affine to Kelvin-ish range, like GlobalStandardScaling inverse
            return {k: v * 10.0 + 270.0 for k, v in images.items()}

    def test_8dev_validation_matches_1dev(self):
        from srewd_tpu.training.trainer import run_validation

        opt = {"train": {}}
        ta = _trainer(n_devices=1)
        ta.init_params(_batch(0))
        ma = run_validation(opt, self._Handler(), ta)

        tb = _trainer(n_devices=8)
        tb.init_params(_batch(0))
        mb = run_validation(opt, self._Handler(), tb)

        assert set(ma) == set(mb) and len(ma) >= 6
        for k in ma:
            assert np.isfinite(ma[k]), k
            assert ma[k] == pytest.approx(mb[k], rel=5e-3, abs=1e-4), k


class TestBuildTrainerSamplerConfig:
    """Config -> sampler_kwargs plumbing (cli.build_trainer), incl. the
    clip_denoised extension: the reference always clamps the x0 estimate
    to [-1,1] (diffusion.py:168-169); on sigma-scaled weather fields that
    saturates everything beyond +-1 sigma (measured in QUALITY_r03.json),
    so the config can turn it off."""

    def _opt(self, dcfg_extra):
        return {
            "seed": 0,
            "path": {},
            "model": {
                "architecture": "sr3",
                "unet": {
                    "in_channel": 2, "out_channel": 1, "inner_channel": 8,
                    "norm_groups": 4, "channel_multiplier": [1, 2],
                    "attn_res": [8], "res_blocks": 1, "dropout": 0.0,
                },
                "beta_schedule": {
                    "train": {"schedule": "linear", "n_timestep": 8,
                              "linear_start": 1e-6, "linear_end": 1e-2},
                },
                "diffusion": {
                    "image_height": H, "image_width": W,
                    "image_channels": 1, "channels": 1, "conditional": True,
                    **dcfg_extra,
                },
            },
            "train": {"optimizer": {"type": "adam", "lr": 1e-4}},
        }

    def test_clip_denoised_knob_reaches_sampler(self):
        from srewd_tpu.cli import build_trainer

        tr = build_trainer(self._opt({"clip_denoised": False}), _batch(0))
        assert tr.sampler_kwargs == {"clip_denoised": False}

    def test_default_keeps_reference_clamp(self):
        from srewd_tpu.cli import build_trainer

        tr = build_trainer(self._opt({}), _batch(0))
        assert "clip_denoised" not in tr.sampler_kwargs

    def test_composes_with_fast_sampler(self):
        from srewd_tpu.cli import build_trainer

        tr = build_trainer(
            self._opt({"sampler": "dpm", "ddim_steps": 25,
                       "clip_denoised": False}), _batch(0))
        assert tr.sampler_kwargs["sampler"] == "dpm"
        assert tr.sampler_kwargs["ddim_steps"] == 25
        assert tr.sampler_kwargs["clip_denoised"] is False
        # the jitted val sampler accepts the combination
        sr = tr.sample_batch(_batch(1))
        assert sr.shape == (B, H, W, 1)

    def test_tau_spacing_and_eta_reach_sampler(self):
        # tau_spacing/ddim_eta config keys (cli.py:68-77) — the knobs the
        # QUALITY_r04 fast-sampler sweep turns; every inference CLI
        # (sample/serve/export) writes them into model.diffusion
        from srewd_tpu.cli import build_trainer

        tr = build_trainer(
            self._opt({"sampler": "ddim", "ddim_steps": 4,
                       "ddim_eta": 1.0, "tau_spacing": "trailing"}),
            _batch(0))
        assert tr.sampler_kwargs["tau_spacing"] == "trailing"
        assert tr.sampler_kwargs["ddim_eta"] == 1.0
        sr = tr.sample_batch(_batch(1))
        assert sr.shape == (B, H, W, 1)

    def test_ddim_eta_defaults_to_ancestral(self):
        # QUALITY_r05 sweep: eta=1 matches the DDPM chain, eta=0 rows are
        # 1.18x bicubic — so the config-layer default is eta=1 (cli.py)
        from srewd_tpu.cli import build_trainer

        tr = build_trainer(
            self._opt({"sampler": "ddim", "ddim_steps": 4}), _batch(0))
        assert tr.sampler_kwargs["ddim_eta"] == 1.0

    def test_grad_clip_knob(self):
        # train.optimizer.grad_clip chains clip_by_global_norm ahead of the
        # optimizer (sr3 collapse mitigation, VAL_CURVE_SR3_r05.json); the
        # clipped trainer must still step and reduce a big-gradient update
        from srewd_tpu.cli import build_trainer

        opt = self._opt({})
        opt["train"]["optimizer"]["grad_clip"] = 1.0
        tr = build_trainer(opt, _batch(0))
        loss = tr.train_on_batch(_batch(1))
        assert np.isfinite(loss)
        # opt_state is now the chained structure (clip state + adam state)
        assert isinstance(tr.opt_state, tuple) and len(tr.opt_state) == 2


class TestFinetuneNorm:
    """finetune_norm (reference model.py:31-44, :208-209): only norm-affine
    params train; checkpoint load is non-strict."""

    def test_only_norm_params_change(self):
        from srewd_tpu.training.optimizers import (
            finetune_norm_optimizer,
            norm_param_mask,
        )

        sched = Schedule.create("linear", n_timestep=8)
        tr = DiffusionTrainer(
            model=_model(), schedule_train=sched, schedule_val=sched,
            optimizer=finetune_norm_optimizer(optax.adam(1e-2)),
            mesh=make_mesh(1), seed=0,
        )
        tr.init_params(_batch(0))
        mask = norm_param_mask(tr.params)
        assert any(jax.tree.leaves(mask)) and not all(jax.tree.leaves(mask))
        before = jax.tree.map(np.asarray, tr.params)
        tr.train_on_batch(_batch(1))
        flat_b = jax.tree_util.tree_flatten_with_path(before)[0]
        flat_a = dict(jax.tree_util.tree_flatten_with_path(
            jax.tree.map(np.asarray, tr.params))[0])
        flat_m = dict(jax.tree_util.tree_flatten_with_path(mask)[0])
        changed_norm = unchanged_other = 0
        for p, b in flat_b:
            a = flat_a[p]
            if flat_m[p]:
                changed_norm += int(not np.array_equal(a, b))
            else:
                np.testing.assert_array_equal(a, b, err_msg=str(p))
                unchanged_other += 1
        assert changed_norm > 0 and unchanged_other > 0

    def test_tolerant_params_load(self, tmp_path):
        t1 = _trainer(str(tmp_path / "ck"))
        t1.init_params(_batch(0))
        t1.train_on_batch(_batch(1))
        t1.step, t1.epoch = 7, 2
        path = t1.save()

        t2 = _trainer()
        t2.init_params(_batch(0))
        t2.load_params_tolerant(path)
        for a, b in zip(_leaves(t1.params), _leaves(t2.params)):
            np.testing.assert_array_equal(a, b)
        assert t2.step == 0 and t2.epoch == 0  # counters stay fresh
        t2.train_on_batch(_batch(2))  # fresh opt_state still usable

    def test_tolerant_load_reseeds_ema(self, tmp_path):
        """With EMA enabled, load_params_tolerant must re-seed ema_params
        from the loaded weights — otherwise the EMA keeps tracking the
        random init for ~1/(1-decay) steps."""
        t1 = _trainer(str(tmp_path / "ck"))
        t1.init_params(_batch(0))
        t1.train_on_batch(_batch(1))
        path = t1.save()

        t2 = _trainer(ema=0.9999)
        t2.init_params(_batch(0))
        t2.load_params_tolerant(path)
        for a, b in zip(_leaves(t2.ema_params), _leaves(t2.params)):
            np.testing.assert_array_equal(a, b)


class TestMetricsStreaming:
    def test_streaming_equals_direct(self):
        from srewd_tpu.training.metrics import ValidationMetrics, create_metric_dict

        rng = np.random.default_rng(0)
        hr = rng.uniform(250, 300, (6, 8, 16, 1)).astype(np.float32)
        sr = hr + rng.standard_normal((6, 8, 16, 1)).astype(np.float32)

        vm = ValidationMetrics(create_metric_dict())
        for lo in (0, 2, 4):  # stream in 3 uneven-order batches
            vm.update(hr[lo : lo + 2], sr[lo : lo + 2])
        m = vm.compute_metrics()

        err = sr - hr
        assert m["MAE"] == pytest.approx(np.abs(err).mean(), rel=1e-5)
        assert m["MSE"] == pytest.approx((err**2).mean(), rel=1e-5)
        assert m["RMSE"] == pytest.approx(np.sqrt((err**2).mean()), rel=1e-5)
        # reference call order is update(HR, SR) with metrics treating the
        # first arg as "predicted": MR = mean(HR - SR) (train.py:100 +
        # metrics.py:188) — the sign convention is preserved exactly.
        assert m["MR"] == pytest.approx(-err.mean(), abs=1e-5)


class TestPrefetcher:
    def test_order_preserved(self):
        from srewd_tpu.data.prefetch import DevicePrefetcher

        items = [{"i": i} for i in range(20)]
        out = list(DevicePrefetcher(iter(items), lambda b: {"i": b["i"] * 2}))
        assert [o["i"] for o in out] == [2 * i for i in range(20)]

    def test_exception_propagates(self):
        from srewd_tpu.data.prefetch import DevicePrefetcher

        def gen():
            yield 1
            raise RuntimeError("boom")

        pf = DevicePrefetcher(gen(), lambda b: b)
        it = iter(pf)
        assert next(it) == 1
        with pytest.raises(RuntimeError, match="boom"):
            list(it)

    def test_early_break_stops_producer(self):
        import threading
        import time as _time

        from srewd_tpu.data.prefetch import DevicePrefetcher

        def slow_gen():
            for i in range(100):
                yield {"i": i}

        pf = DevicePrefetcher(slow_gen(), lambda b: b, depth=2)
        for j, _ in enumerate(pf):
            if j == 3:
                break  # GeneratorExit -> close()
        _time.sleep(0.3)
        assert not pf._thread.is_alive()
        assert threading.active_count() < 20

    def test_trainer_accepts_predevice_batches(self):
        t = _trainer()
        t.init_params(_batch(0))
        pre = t._device_batch(_batch(1))
        loss = t.train_on_batch(pre)  # idempotent device placement
        assert np.isfinite(loss)


class TestPSNRStreaming:
    def test_streaming_equals_direct(self):
        from srewd_tpu.training.metrics import PSNR

        rng = np.random.default_rng(1)
        t = rng.uniform(250, 300, (6, 8, 16, 1))
        p = t + rng.standard_normal((6, 8, 16, 1))
        m = PSNR()
        for lo in (0, 2, 4):
            m.update(p[lo : lo + 2], t[lo : lo + 2])
        mse = np.mean((p - t) ** 2)
        dr = t.max() - t.min()
        assert m.compute() == pytest.approx(10 * np.log10(dr**2 / mse), rel=1e-6)

