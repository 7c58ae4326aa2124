"""Diffusion schedule + reverse-process numerics tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srewd_tpu.diffusion.gaussian import (
    draw_time_and_gamma,
    p_sample_step,
    predict_start_from_noise,
    q_posterior,
    q_sample,
    sample_chain,
)
from srewd_tpu.diffusion.schedule import Schedule, make_beta_schedule


class TestBetaSchedules:
    def test_linear_matches_reference_config(self):
        # linear 1e-6 -> 1e-2, T=1000 is the schedule of every experiment
        # config (SURVEY.md §2.2).
        b = make_beta_schedule("linear", 1000, 1e-6, 1e-2)
        assert b.shape == (1000,)
        assert b[0] == pytest.approx(1e-6)
        assert b[-1] == pytest.approx(1e-2)
        assert np.all(np.diff(b) > 0)

    def test_all_schedules_valid(self):
        for name in ("quad", "linear", "warmup10", "warmup50", "const", "jsd", "cosine"):
            b = make_beta_schedule(name, 100, 1e-6, 1e-2)
            assert b.shape == (100,)
            assert np.all(b > 0) and np.all(b <= 1.0), name

    def test_warmup_structure(self):
        b = make_beta_schedule("warmup10", 100, 1e-6, 1e-2)
        assert np.all(b[10:] == 1e-2)
        assert b[0] == pytest.approx(1e-6)

    def test_jsd(self):
        b = make_beta_schedule("jsd", 10)
        np.testing.assert_allclose(b, 1.0 / np.arange(10, 0, -1))


class TestScheduleBuffers:
    def test_derived_quantities(self):
        s = Schedule.create("linear", 100, 1e-6, 1e-2)
        betas = np.asarray(s.betas, np.float64)
        ac = np.cumprod(1 - betas)
        np.testing.assert_allclose(np.asarray(s.alphas_cumprod), ac, rtol=1e-5)
        assert s.sqrt_alphas_cumprod_prev.shape == (101,)
        assert float(s.sqrt_alphas_cumprod_prev[0]) == 1.0
        np.testing.assert_allclose(
            np.asarray(s.sqrt_alphas_cumprod_prev[1:]), np.sqrt(ac), rtol=1e-5
        )
        # posterior mean coefficients sum behaviour at x0 == x_t == x
        t = 50
        np.testing.assert_allclose(
            float(s.posterior_mean_coef1[t] + s.posterior_mean_coef2[t]),
            1.0,
            rtol=1e-4,
        )

    def test_posterior_variance_clipping(self):
        s = Schedule.create("linear", 100, 1e-6, 1e-2)
        # first step posterior variance is 0 -> clipped log
        assert float(s.posterior_log_variance_clipped[0]) == pytest.approx(
            np.log(1e-20), rel=1e-5
        )


class TestForwardReverse:
    def test_q_sample_variance_preserving(self):
        key = jax.random.key(0)
        x0 = jnp.ones((4, 8, 8, 1))
        gamma = jnp.full((4,), 0.6)
        noise = jax.random.normal(key, x0.shape)
        xt = q_sample(x0, gamma, noise)
        np.testing.assert_allclose(
            np.asarray(xt), 0.6 * np.asarray(x0) + np.sqrt(1 - 0.36) * np.asarray(noise),
            rtol=1e-5, atol=1e-6,
        )

    def test_predict_start_inverts_q_sample_at_discrete_t(self):
        s = Schedule.create("linear", 100, 1e-6, 1e-2)
        t = 40
        key = jax.random.key(1)
        x0 = jax.random.normal(key, (2, 8, 8, 1))
        noise = jax.random.normal(jax.random.fold_in(key, 1), x0.shape)
        gamma = jnp.broadcast_to(jnp.sqrt(s.alphas_cumprod[t]), (2,))
        xt = q_sample(x0, gamma, noise)
        x0_hat = predict_start_from_noise(s, xt, t, noise)
        np.testing.assert_allclose(np.asarray(x0_hat), np.asarray(x0), rtol=1e-3, atol=1e-4)

    def test_q_posterior_interpolates(self):
        s = Schedule.create("linear", 100, 1e-6, 1e-2)
        x = jnp.ones((1, 4, 4, 1)) * 0.5
        mean, logvar = q_posterior(s, x, x, 10)
        np.testing.assert_allclose(np.asarray(mean), 0.5, rtol=1e-4)
        assert logvar.shape == ()

    def test_draw_time_and_gamma_bounds(self):
        s = Schedule.create("linear", 50, 1e-6, 1e-2)
        t, gamma = draw_time_and_gamma(jax.random.key(0), s, 64)
        t = int(t)
        assert 1 <= t <= 50
        lo = float(s.sqrt_alphas_cumprod_prev[t - 1])
        hi = float(s.sqrt_alphas_cumprod_prev[t])
        g = np.asarray(gamma)
        assert np.all(g >= min(lo, hi)) and np.all(g <= max(lo, hi))

    def test_final_step_adds_no_noise(self):
        s = Schedule.create("linear", 10, 1e-4, 1e-2)
        denoise = lambda x, lvl: jnp.zeros_like(x)  # noqa: E731
        img = jnp.ones((1, 4, 4, 1)) * 0.3
        out1 = p_sample_step(s, denoise, img, 0, jax.random.key(0))
        out2 = p_sample_step(s, denoise, img, 0, jax.random.key(99))
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))

    def test_sample_chain_shape_and_determinism(self):
        s = Schedule.create("linear", 6, 1e-4, 1e-2)
        denoise = lambda x, lvl: 0.1 * x  # noqa: E731
        out1 = sample_chain(s, denoise, (2, 8, 8, 1), jax.random.key(3))
        out2 = sample_chain(s, denoise, (2, 8, 8, 1), jax.random.key(3))
        assert out1.shape == (2, 8, 8, 1)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))
        out3 = sample_chain(s, denoise, (2, 8, 8, 1), jax.random.key(4))
        assert not np.allclose(np.asarray(out1), np.asarray(out3))


class TestContinuousMode:
    def test_keep_every_matches_plain_chain(self):
        """Segmented collection must not change the step sequence."""
        import jax

        from srewd_tpu.diffusion.gaussian import sample_chain
        from srewd_tpu.diffusion.schedule import Schedule

        sched = Schedule.create("linear", n_timestep=10)

        def mock(x, lvl):
            return 0.1 * x + 0.05 * lvl.reshape(-1, 1, 1, 1)

        key = jax.random.key(0)
        plain = sample_chain(sched, mock, (2, 8, 16, 1), key)
        final, frames = sample_chain(sched, mock, (2, 8, 16, 1), key, keep_every=3)
        assert frames.shape == (3, 2, 8, 16, 1)  # 10 // 3 segments
        np.testing.assert_allclose(np.asarray(final), np.asarray(plain), atol=1e-6)

    def test_keep_every_divides_exactly(self):
        import jax

        from srewd_tpu.diffusion.gaussian import sample_chain
        from srewd_tpu.diffusion.schedule import Schedule

        sched = Schedule.create("linear", n_timestep=8)
        key = jax.random.key(1)

        def mock(x, lvl):
            return 0.2 * x

        final, frames = sample_chain(sched, mock, (1, 4, 4, 1), key, keep_every=4)
        assert frames.shape == (2, 1, 4, 4, 1)
        np.testing.assert_allclose(np.asarray(frames[-1]), np.asarray(final), atol=1e-6)


class TestDDIM:
    """DDIM sub-sequence sampler (arXiv:2010.02502)."""

    def _perfect_denoiser(self, x0):
        """Oracle eps from the conditioning level: lvl == sqrt(acp[tau])."""

        def fn(x, lvl):
            a = (lvl**2).reshape(-1, 1, 1, 1)
            return (x - jnp.sqrt(a) * x0) / jnp.sqrt(1.0 - a)

        return fn

    def test_recovers_x0_with_oracle_denoiser(self):
        import jax

        from srewd_tpu.diffusion.gaussian import ddim_sample_chain
        from srewd_tpu.diffusion.schedule import Schedule

        sched = Schedule.create("linear", n_timestep=100,
                                linear_start=1e-4, linear_end=2e-2)
        rng = np.random.default_rng(0)
        x0 = jnp.asarray(rng.uniform(-0.9, 0.9, (2, 8, 16, 1)), jnp.float32)
        for steps in (100, 10, 3):
            out = ddim_sample_chain(
                sched, self._perfect_denoiser(x0), x0.shape,
                jax.random.key(1), steps=steps, eta=0.0,
            )
            np.testing.assert_allclose(np.asarray(out), np.asarray(x0),
                                       atol=2e-3, err_msg=f"steps={steps}")

    def test_eta0_deterministic_in_chain_noise(self):
        import jax

        from srewd_tpu.diffusion.gaussian import ddim_sample_chain
        from srewd_tpu.diffusion.schedule import Schedule

        sched = Schedule.create("linear", n_timestep=20)

        def mock(x, lvl):
            return 0.1 * x

        # different keys -> different init noise, but split the key so
        # init matches: same key must give identical output; eta>0 with
        # same key also identical (keys folded) — determinism check only.
        a = ddim_sample_chain(sched, mock, (1, 4, 8, 1), jax.random.key(5), steps=7)
        b = ddim_sample_chain(sched, mock, (1, 4, 8, 1), jax.random.key(5), steps=7)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_keep_every_matches_plain_ddim(self):
        """Segmented frame collection must not change the DDIM step sequence
        (reference continous=True x the repo's DDIM extension)."""
        import jax

        from srewd_tpu.diffusion.gaussian import ddim_sample_chain
        from srewd_tpu.diffusion.schedule import Schedule

        sched = Schedule.create("linear", n_timestep=40)

        def mock(x, lvl):
            return 0.1 * x + 0.05 * lvl.reshape(-1, 1, 1, 1)

        key = jax.random.key(2)
        plain = ddim_sample_chain(sched, mock, (2, 8, 16, 1), key, steps=10)
        final, frames = ddim_sample_chain(
            sched, mock, (2, 8, 16, 1), key, steps=10, keep_every=3
        )
        assert frames.shape == (3, 2, 8, 16, 1)  # 10 // 3 segments
        np.testing.assert_allclose(np.asarray(final), np.asarray(plain), atol=1e-6)

    def test_keep_every_oracle_frames_converge(self):
        """With the oracle denoiser, frames approach x0 and the last frame
        equals the final image when keep_every divides the step count."""
        import jax

        from srewd_tpu.diffusion.gaussian import ddim_sample_chain
        from srewd_tpu.diffusion.schedule import Schedule

        sched = Schedule.create("linear", n_timestep=100,
                                linear_start=1e-4, linear_end=2e-2)
        rng = np.random.default_rng(4)
        x0 = jnp.asarray(rng.uniform(-0.9, 0.9, (2, 8, 16, 1)), jnp.float32)
        final, frames = ddim_sample_chain(
            sched, self._perfect_denoiser(x0), x0.shape,
            jax.random.key(1), steps=8, eta=0.0, keep_every=2,
        )
        assert frames.shape == (4, 2, 8, 16, 1)
        np.testing.assert_allclose(np.asarray(frames[-1]), np.asarray(final),
                                   atol=1e-6)
        errs = [float(jnp.abs(f - x0).mean()) for f in frames]
        assert errs[-1] < errs[0]  # frames converge toward x0

    def test_model_api_ddim_frames(self):
        """generate_sr(sampler='ddim', keep_every=K) returns (img, frames)
        with residual addback applied to the frames too."""
        import jax

        from srewd_tpu.diffusion.schedule import Schedule
        from srewd_tpu.models.factory import DiffusionModel
        from srewd_tpu.models.unet import WeatherUNet
        from srewd_tpu.ops.resize import bicubic_up4

        unet = WeatherUNet(variant="sr3", out_channel=1, inner_channel=8,
                           norm_groups=4, channel_mults=(1, 2), attn_res=(8,),
                           res_blocks=1, image_height=16, image_width=32,
                           image_channels=1)
        m = DiffusionModel(arch="sr3", unet=unet)
        sched = Schedule.create("linear", n_timestep=50)
        rng = np.random.default_rng(7)
        batch = {
            "HR": jnp.asarray(rng.standard_normal((2, 16, 32, 1)), jnp.float32),
            "LR": jnp.asarray(rng.standard_normal((2, 4, 8, 1)), jnp.float32),
        }
        batch["SR"] = bicubic_up4(batch["LR"])
        p = m.init(jax.random.key(0), batch)
        img, frames = m.generate_sr(p, batch, jax.random.key(2), sched,
                                    sampler="ddim", ddim_steps=10, keep_every=5)
        assert img.shape == batch["HR"].shape
        assert frames.shape == (2, 2, 16, 32, 1)
        np.testing.assert_allclose(np.asarray(frames[-1]), np.asarray(img),
                                   atol=1e-6)

    def test_model_api_and_throughput_ratio(self):
        import jax

        from srewd_tpu.diffusion.schedule import Schedule
        from srewd_tpu.models.factory import DiffusionModel
        from srewd_tpu.models.unet import WeatherUNet
        from srewd_tpu.ops.resize import bicubic_up4

        unet = WeatherUNet(variant="sr3", out_channel=1, inner_channel=8,
                           norm_groups=4, channel_mults=(1, 2), attn_res=(8,),
                           res_blocks=1, image_height=16, image_width=32,
                           image_channels=1)
        m = DiffusionModel(arch="sr3", unet=unet)
        sched = Schedule.create("linear", n_timestep=50)
        rng = np.random.default_rng(1)
        batch = {
            "HR": jnp.asarray(rng.standard_normal((2, 16, 32, 1)), jnp.float32),
            "LR": jnp.asarray(rng.standard_normal((2, 4, 8, 1)), jnp.float32),
        }
        batch["SR"] = bicubic_up4(batch["LR"])
        p = m.init(jax.random.key(0), batch)
        out = m.generate_sr(p, batch, jax.random.key(2), sched,
                            sampler="ddim", ddim_steps=10)
        assert out.shape == batch["HR"].shape
        assert bool(jnp.all(jnp.isfinite(out)))


class TestDPMSolver:
    """DPM-Solver++(2M) (arXiv:2211.01095) — beyond-reference fast sampler."""

    def _perfect_denoiser(self, x0):
        def fn(x, lvl):
            a = (lvl**2).reshape(-1, 1, 1, 1)
            return (x - jnp.sqrt(a) * x0) / jnp.sqrt(1.0 - a)

        return fn

    def test_recovers_x0_with_oracle_denoiser(self):
        import jax

        from srewd_tpu.diffusion.gaussian import dpm_solver_chain
        from srewd_tpu.diffusion.schedule import Schedule

        sched = Schedule.create("linear", n_timestep=100,
                                linear_start=1e-4, linear_end=2e-2)
        rng = np.random.default_rng(0)
        x0 = jnp.asarray(rng.uniform(-0.9, 0.9, (2, 8, 16, 1)), jnp.float32)
        for steps in (100, 10, 3, 1):
            out = dpm_solver_chain(
                sched, self._perfect_denoiser(x0), x0.shape,
                jax.random.key(1), steps=steps,
            )
            np.testing.assert_allclose(np.asarray(out), np.asarray(x0),
                                       atol=2e-3, err_msg=f"steps={steps}")

    def test_two_steps_equals_ddim(self):
        """With <=2 steps every update is first-order, which IS DDIM eta=0
        (the closed-form e^{-h} identity in the docstring) — bit-near."""
        import jax

        from srewd_tpu.diffusion.gaussian import (
            ddim_sample_chain,
            dpm_solver_chain,
        )
        from srewd_tpu.diffusion.schedule import Schedule

        sched = Schedule.create("linear", n_timestep=50)

        def mock(x, lvl):
            return 0.1 * x + 0.05 * lvl.reshape(-1, 1, 1, 1)

        for steps in (1, 2):
            a = dpm_solver_chain(sched, mock, (2, 4, 8, 1),
                                 jax.random.key(3), steps=steps)
            b = ddim_sample_chain(sched, mock, (2, 4, 8, 1),
                                  jax.random.key(3), steps=steps, eta=0.0)
            a2 = dpm_solver_chain(sched, mock, (2, 4, 8, 1),
                                  jax.random.key(99), steps=steps)
            assert not np.allclose(np.asarray(a), np.asarray(a2))  # key matters
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=2e-6,
                                       err_msg=f"steps={steps}")

    def test_second_order_beats_ddim_at_equal_budget(self):
        """The point of the solver: against a tight-step DDIM reference of the
        same probability-flow ODE, DPM++(2M) at S steps lands closer than
        DDIM at S steps (clipping off so the ODE is smooth)."""
        import jax

        from srewd_tpu.diffusion.gaussian import (
            ddim_sample_chain,
            dpm_solver_chain,
        )
        from srewd_tpu.diffusion.schedule import Schedule

        sched = Schedule.create("linear", n_timestep=1000,
                                linear_start=1e-6, linear_end=1e-2)

        def mock(x, lvl):
            return jnp.tanh(0.5 * x) + 0.1 * lvl.reshape(-1, 1, 1, 1)

        key = jax.random.key(7)
        shape = (2, 4, 8, 1)
        ref = np.asarray(ddim_sample_chain(
            sched, mock, shape, key, steps=1000, eta=0.0, clip_denoised=False))
        for s in (10, 15, 25):
            e_dpm = np.abs(np.asarray(dpm_solver_chain(
                sched, mock, shape, key, steps=s, clip_denoised=False)) - ref).mean()
            e_ddim = np.abs(np.asarray(ddim_sample_chain(
                sched, mock, shape, key, steps=s, eta=0.0,
                clip_denoised=False)) - ref).mean()
            assert e_dpm < e_ddim, f"steps={s}: dpm {e_dpm} vs ddim {e_ddim}"

    def test_keep_every_matches_plain(self):
        import jax

        from srewd_tpu.diffusion.gaussian import dpm_solver_chain
        from srewd_tpu.diffusion.schedule import Schedule

        sched = Schedule.create("linear", n_timestep=40)

        def mock(x, lvl):
            return 0.1 * x + 0.05 * lvl.reshape(-1, 1, 1, 1)

        key = jax.random.key(2)
        plain = dpm_solver_chain(sched, mock, (2, 8, 16, 1), key, steps=10)
        # non-dividing keep_every: tail steps run after the last frame
        final, frames = dpm_solver_chain(
            sched, mock, (2, 8, 16, 1), key, steps=10, keep_every=3
        )
        assert frames.shape == (3, 2, 8, 16, 1)
        np.testing.assert_allclose(np.asarray(final), np.asarray(plain), atol=1e-6)
        # dividing keep_every: the last frame IS the final image
        final5, frames5 = dpm_solver_chain(
            sched, mock, (2, 8, 16, 1), key, steps=10, keep_every=5
        )
        np.testing.assert_allclose(np.asarray(final5), np.asarray(plain), atol=1e-6)
        np.testing.assert_allclose(np.asarray(frames5[-1]), np.asarray(final5),
                                   atol=1e-6)

    def test_model_api_dpm(self):
        """generate_sr(sampler='dpm') routes and applies residual addback."""
        import jax

        from srewd_tpu.diffusion.schedule import Schedule
        from srewd_tpu.models.factory import DiffusionModel
        from srewd_tpu.models.unet import WeatherUNet
        from srewd_tpu.ops.resize import bicubic_up4

        unet = WeatherUNet(variant="sr3", out_channel=1, inner_channel=8,
                           norm_groups=4, channel_mults=(1, 2), attn_res=(8,),
                           res_blocks=1, image_height=16, image_width=32,
                           image_channels=1)
        m = DiffusionModel(arch="sr3", unet=unet)
        sched = Schedule.create("linear", n_timestep=50)
        rng = np.random.default_rng(1)
        batch = {
            "HR": jnp.asarray(rng.standard_normal((2, 16, 32, 1)), jnp.float32),
            "LR": jnp.asarray(rng.standard_normal((2, 4, 8, 1)), jnp.float32),
        }
        batch["SR"] = bicubic_up4(batch["LR"])
        p = m.init(jax.random.key(0), batch)
        out = m.generate_sr(p, batch, jax.random.key(2), sched,
                            sampler="dpm", ddim_steps=8)
        assert out.shape == batch["HR"].shape
        assert bool(jnp.all(jnp.isfinite(out)))


class TestTauSpacing:
    """select_taus — fast-sampler timestep spacings (gaussian.select_taus)."""

    def _sched(self):
        from srewd_tpu.diffusion.schedule import Schedule

        # the reference's production schedule (linear 1e-6 -> 1e-2, T=1000)
        return Schedule.create("linear", n_timestep=1000,
                               linear_start=1e-6, linear_end=1e-2)

    def test_properties(self):
        from srewd_tpu.diffusion.gaussian import select_taus

        sched = self._sched()
        for spacing in ("linspace", "trailing", "quad", "logsnr"):
            taus = select_taus(sched, 50, spacing)
            assert taus.ndim == 1 and len(taus) >= 2, spacing
            assert np.all(np.diff(taus) > 0), spacing  # ascending unique
            assert taus[0] >= 0 and taus[-1] == 999, spacing
            if spacing != "trailing":  # trailing skips t=0 by construction
                assert taus[0] == 0, spacing

    def test_unknown_spacing_raises(self):
        import pytest

        from srewd_tpu.diffusion.gaussian import select_taus

        with pytest.raises(ValueError):
            select_taus(self._sched(), 50, "nope")

    def test_logsnr_concentrates_low_t(self):
        """On the production schedule the high-SNR region is compressed into
        the first few dozen timesteps; logsnr spacing must spend many more
        of its 50 steps there than uniform-in-t does (~3)."""
        from srewd_tpu.diffusion.gaussian import select_taus

        sched = self._sched()
        lin = select_taus(sched, 50, "linspace")
        log = select_taus(sched, 50, "logsnr")
        assert (log < 50).sum() >= 3 * max(int((lin < 50).sum()), 1)

    def test_residual_regime_logsnr_beats_linspace(self):
        """The trained-model failure mode (VERDICT r3 #1) in miniature: a
        small-amplitude x0 (residual archs' HR - bicubic target, ~0.05 sigma)
        makes the informative chain region tiny in t. A Bayes-optimal
        denoiser for a two-point prior x0 = +-s discriminates the spacings:
        uniform-in-t DDIM-50 misses the decision region, logsnr resolves it."""
        import jax

        from srewd_tpu.diffusion.gaussian import ddim_sample_chain
        from srewd_tpu.diffusion.schedule import Schedule

        sched = Schedule.create("linear", n_timestep=1000,
                                linear_start=1e-6, linear_end=1e-2)
        s = 0.05

        def bayes(x, lvl):
            a = (lvl**2).reshape(-1, 1, 1, 1)
            x0 = s * jnp.tanh(jnp.sqrt(a) * s * x / jnp.maximum(1.0 - a, 1e-12))
            return (x - jnp.sqrt(a) * x0) / jnp.sqrt(jnp.maximum(1.0 - a, 1e-12))

        key = jax.random.key(11)
        shape = (4, 8, 16, 1)
        ref = np.asarray(ddim_sample_chain(
            sched, bayes, shape, key, steps=1000, clip_denoised=False))
        errs = {}
        for spacing in ("linspace", "logsnr"):
            out = np.asarray(ddim_sample_chain(
                sched, bayes, shape, key, steps=50, clip_denoised=False,
                tau_spacing=spacing))
            errs[spacing] = np.abs(out - ref).mean()
        # the tight-step chain commits to +-s; spacing decides whether the
        # 50-step walk gets there
        assert errs["logsnr"] < 0.5 * errs["linspace"], errs

    def test_oracle_exact_under_all_spacings(self):
        """With an exact denoiser DDIM is exact for any sub-sequence —
        spacing changes efficiency, never correctness."""
        import jax

        from srewd_tpu.diffusion.gaussian import (
            ddim_sample_chain,
            dpm_solver_chain,
        )
        from srewd_tpu.diffusion.schedule import Schedule

        sched = Schedule.create("linear", n_timestep=200,
                                linear_start=1e-4, linear_end=2e-2)
        rng = np.random.default_rng(3)
        x0 = jnp.asarray(rng.uniform(-0.9, 0.9, (2, 8, 16, 1)), jnp.float32)

        def oracle(x, lvl):
            a = (lvl**2).reshape(-1, 1, 1, 1)
            return (x - jnp.sqrt(a) * x0) / jnp.sqrt(1.0 - a)

        for spacing in ("linspace", "trailing", "quad", "logsnr"):
            for chain, kw in ((ddim_sample_chain, {"eta": 0.0}),
                              (dpm_solver_chain, {})):
                out = chain(sched, oracle, x0.shape, jax.random.key(1),
                            steps=12, tau_spacing=spacing, **kw)
                np.testing.assert_allclose(
                    np.asarray(out), np.asarray(x0), atol=5e-3,
                    err_msg=f"{chain.__name__} {spacing}")
