"""Bit-level diffusion-math parity against the PyTorch reference.

Runs the reference's own GaussianDiffusion (imported from /root/reference)
side-by-side with our pure functions, using a shared MOCK denoiser (a fixed
linear map of its inputs) and identical noise draws, so every schedule
constant, index convention (t vs t+1 noise level), clamp, and posterior
coefficient is pinned without needing network-weight conversion.

Accuracy gate context (BASELINE.md): <=1e-3 relative RMSE vs reference —
the chain math here matches to float32 round-off (~1e-6), so any end-to-end
deviation can only come from network weights/ops, which have their own
golden tests (tests/test_ops.py).

Skipped when the reference tree or torch is unavailable.
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")

try:
    from models.diffusion_models.diffusion import GaussianDiffusion  # noqa: E402
except Exception:  # pragma: no cover
    pytest.skip("reference repo not importable", allow_module_level=True)

from srewd_tpu.diffusion.gaussian import (  # noqa: E402
    p_sample_step,
    predict_start_from_noise,
    q_posterior,
    q_sample,
)
from srewd_tpu.diffusion.schedule import Schedule  # noqa: E402

B, C, H, W = 2, 1, 8, 16
T = 20
SCHED_OPT = {"schedule": "linear", "n_timestep": T,
             "linear_start": 1e-6, "linear_end": 1e-2}


class _MockNet(torch.nn.Module):
    """Deterministic 'denoiser': eps = 0.1*x + 0.05*sin(noise_level)."""

    def forward(self, x, noise_level):
        x_img = x[:, -C:]  # last C channels = the noisy map (concat cond)
        lvl = noise_level.reshape(-1, 1, 1, 1)
        return 0.1 * x_img + 0.05 * torch.sin(lvl)


def _mock_jax(x_img, noise_level):
    lvl = noise_level.reshape(-1, 1, 1, 1).astype(jnp.float32)
    return 0.1 * x_img + 0.05 * jnp.sin(lvl)


@pytest.fixture(scope="module")
def ref():
    d = GaussianDiffusion(_MockNet(), channels=C, image_height=H, image_width=W)
    d.set_new_noise_schedule(SCHED_OPT, "cpu")
    return d


@pytest.fixture(scope="module")
def sched():
    return Schedule.create(**{"schedule": "linear", "n_timestep": T,
                              "linear_start": 1e-6, "linear_end": 1e-2})


class TestScheduleBuffers:
    def test_all_buffers_match(self, ref, sched):
        pairs = [
            ("betas", sched.betas),
            ("alphas_cumprod", sched.alphas_cumprod),
            ("alphas_cumprod_prev", sched.alphas_cumprod_prev),
            ("sqrt_recip_alphas_cumprod", sched.sqrt_recip_alphas_cumprod),
            ("sqrt_recipm1_alphas_cumprod", sched.sqrt_recipm1_alphas_cumprod),
            ("posterior_variance", sched.posterior_variance),
            ("posterior_log_variance_clipped", sched.posterior_log_variance_clipped),
            ("posterior_mean_coef1", sched.posterior_mean_coef1),
            ("posterior_mean_coef2", sched.posterior_mean_coef2),
        ]
        for name, ours in pairs:
            theirs = getattr(ref, name)
            theirs = theirs.numpy() if torch.is_tensor(theirs) else np.asarray(theirs)
            np.testing.assert_allclose(
                np.asarray(ours), theirs, rtol=1e-6, atol=1e-7, err_msg=name
            )
        # numpy-kept buffer of length T+1 (diffusion.py:68-69)
        np.testing.assert_allclose(
            np.asarray(sched.sqrt_alphas_cumprod_prev),
            np.asarray(ref.sqrt_alphas_cumprod_prev),
            rtol=1e-6,
        )


class TestForwardProcess:
    def test_q_sample_matches(self, ref, sched):
        rng = np.random.default_rng(0)
        x0 = rng.standard_normal((B, C, H, W)).astype(np.float32)
        eps = rng.standard_normal((B, C, H, W)).astype(np.float32)
        gamma = np.float32(0.7)
        theirs = ref.q_sample(
            torch.from_numpy(x0), torch.tensor(gamma), torch.from_numpy(eps)
        ).numpy()
        ours = q_sample(
            jnp.asarray(np.transpose(x0, (0, 2, 3, 1))),
            jnp.full((B,), gamma),
            jnp.asarray(np.transpose(eps, (0, 2, 3, 1))),
        )
        np.testing.assert_allclose(
            np.transpose(np.asarray(ours), (0, 3, 1, 2)), theirs, rtol=1e-6, atol=1e-7
        )

    def test_predict_start_and_posterior_match(self, ref, sched):
        rng = np.random.default_rng(1)
        xt = rng.standard_normal((B, C, H, W)).astype(np.float32)
        eps = rng.standard_normal((B, C, H, W)).astype(np.float32)
        for t in (0, 3, T - 1):
            theirs = ref.predict_start_from_noise(
                torch.from_numpy(xt), t, torch.from_numpy(eps)
            ).numpy()
            ours = predict_start_from_noise(
                sched,
                jnp.asarray(np.transpose(xt, (0, 2, 3, 1))),
                jnp.int32(t),
                jnp.asarray(np.transpose(eps, (0, 2, 3, 1))),
            )
            np.testing.assert_allclose(
                np.transpose(np.asarray(ours), (0, 3, 1, 2)), theirs,
                rtol=1e-5, atol=1e-6,
            )
            m_t, lv_t = ref.q_posterior(
                torch.from_numpy(eps), torch.from_numpy(xt), t
            )
            m_o, lv_o = q_posterior(
                sched,
                jnp.asarray(np.transpose(eps, (0, 2, 3, 1))),
                jnp.asarray(np.transpose(xt, (0, 2, 3, 1))),
                jnp.int32(t),
            )
            np.testing.assert_allclose(
                np.transpose(np.asarray(m_o), (0, 3, 1, 2)), m_t.numpy(),
                rtol=1e-5, atol=1e-6,
            )
            assert float(lv_o) == pytest.approx(float(lv_t), rel=1e-6)


class TestReverseChain:
    def test_full_chain_matches_with_shared_noise(self, ref, sched):
        """T reverse steps, identical mock denoiser and noise draws."""
        rng = np.random.default_rng(2)
        cond = rng.standard_normal((B, C, H, W)).astype(np.float32)
        img0 = rng.standard_normal((B, C, H, W)).astype(np.float32)
        step_noise = [
            rng.standard_normal((B, C, H, W)).astype(np.float32) for _ in range(T)
        ]

        # --- reference chain (p_sample math inlined to inject fixed noise) ---
        x = torch.from_numpy(img0.copy())
        cond_t = torch.from_numpy(cond)
        with torch.no_grad():
            for t in reversed(range(T)):
                mean, log_var = ref.p_mean_variance(
                    x, t, clip_denoised=True, condition_x=cond_t
                )
                noise = (
                    torch.from_numpy(step_noise[t]) if t > 0 else torch.zeros_like(x)
                )
                x = mean + noise * (0.5 * log_var).exp()
        theirs = x.numpy()

        # --- our chain with the same injected noise ---
        cond_j = jnp.asarray(np.transpose(cond, (0, 2, 3, 1)))

        def denoise_fn(x_t, lvl):
            return _mock_jax(x_t, lvl)

        x_j = jnp.asarray(np.transpose(img0, (0, 2, 3, 1)))
        for t in reversed(range(T)):
            b = x_j.shape[0]
            lvl = jnp.broadcast_to(sched.sqrt_alphas_cumprod_prev[t + 1], (b,))
            eps = denoise_fn(x_j, lvl)
            x_recon = jnp.clip(predict_start_from_noise(sched, x_j, t, eps), -1.0, 1.0)
            mean, log_var = q_posterior(sched, x_recon, x_j, t)
            nz = (
                jnp.asarray(np.transpose(step_noise[t], (0, 2, 3, 1)))
                if t > 0
                else jnp.zeros_like(x_j)
            )
            x_j = mean + nz * jnp.exp(0.5 * log_var)
        ours = np.transpose(np.asarray(x_j), (0, 3, 1, 2))

        rel_rmse = np.sqrt(np.mean((ours - theirs) ** 2)) / (
            np.sqrt(np.mean(theirs**2)) + 1e-12
        )
        assert rel_rmse < 1e-5, f"chain relative RMSE {rel_rmse}"

    def test_p_sample_step_noise_gate(self, sched):
        """Our scan-step matches the manual step incl. the t==0 gate."""
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
        key = jax.random.key(7)
        out0 = p_sample_step(sched, _mock_jax, x, jnp.int32(0), key)
        lvl = jnp.broadcast_to(sched.sqrt_alphas_cumprod_prev[1], (B,))
        eps = _mock_jax(x, lvl)
        x_recon = jnp.clip(predict_start_from_noise(sched, x, 0, eps), -1.0, 1.0)
        mean, _ = q_posterior(sched, x_recon, x, 0)
        np.testing.assert_allclose(np.asarray(out0), np.asarray(mean), rtol=1e-6)


class TestWeightLevelParity:
    """Same weights -> same outputs: torch sr3 UNet vs WeatherUNet."""

    CFG = dict(in_channel=2, out_channel=1, inner_channel=16,
               norm_groups=8, channel_mults=(1, 2), attn_res=(8,),
               res_blocks=2, dropout=0, image_height=16, image_width=32,
               image_channels=1)

    @pytest.fixture(scope="class")
    def pair(self):
        from models.diffusion_models.sr3.unet import UNet as TorchUNet

        from srewd_tpu.models.unet import WeatherUNet
        from srewd_tpu.utils.torch_convert import convert_sr3_unet_state

        torch.manual_seed(0)
        tnet = TorchUNet(**self.CFG)
        tnet.eval()
        params = convert_sr3_unet_state(tnet.state_dict())
        jnet = WeatherUNet(
            variant="sr3",
            in_channel=self.CFG["in_channel"],
            out_channel=self.CFG["out_channel"],
            inner_channel=self.CFG["inner_channel"],
            norm_groups=self.CFG["norm_groups"],
            channel_mults=self.CFG["channel_mults"],
            attn_res=self.CFG["attn_res"],
            res_blocks=self.CFG["res_blocks"],
            dropout=0.0,
            image_height=self.CFG["image_height"],
            image_width=self.CFG["image_width"],
            image_channels=1,
        )
        # structural check: converted tree covers exactly the init tree
        ref_tree = jnet.init(
            jax.random.key(0),
            jnp.zeros((1, 16, 32, 2)),
            jnp.ones((1,)),
        )["params"]
        flat_ref = jax.tree_util.tree_flatten_with_path(ref_tree)[0]
        flat_got = jax.tree_util.tree_flatten_with_path(
            jax.tree.map(jnp.asarray, params)
        )[0]
        assert len(flat_ref) == len(flat_got), (
            f"param count mismatch: init {len(flat_ref)} vs converted {len(flat_got)}"
        )
        def by_name(flat):
            return sorted((jax.tree_util.keystr(p), v.shape) for p, v in flat)

        for (pr, sr), (pg, sg) in zip(by_name(flat_ref), by_name(flat_got)):
            assert pr == pg and sr == sg, (pr, sr, pg, sg)
        return tnet, jnet, jax.tree.map(jnp.asarray, params)

    def test_forward_parity(self, pair):
        tnet, jnet, params = pair
        rng = np.random.default_rng(5)
        x = rng.standard_normal((2, 2, 16, 32)).astype(np.float32)
        lvl = np.asarray([0.83, 0.42], np.float32)
        with torch.no_grad():
            theirs = tnet(
                torch.from_numpy(x), torch.from_numpy(lvl).reshape(2, 1)
            ).numpy()
        ours = jnet.apply(
            {"params": params},
            jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
            jnp.asarray(lvl),
            train=False,
        )
        ours = np.transpose(np.asarray(ours), (0, 3, 1, 2))
        rel = np.max(np.abs(ours - theirs)) / (np.max(np.abs(theirs)) + 1e-12)
        assert rel < 1e-4, f"forward rel max err {rel}"

    def test_full_chain_weight_parity(self, pair, sched):
        """T reverse steps with the REAL network both sides, shared noise."""
        tnet, jnet, params = pair
        rng = np.random.default_rng(6)
        cond = rng.standard_normal((1, 1, 16, 32)).astype(np.float32)
        img0 = rng.standard_normal((1, 1, 16, 32)).astype(np.float32)
        noises = [rng.standard_normal((1, 1, 16, 32)).astype(np.float32)
                  for _ in range(T)]
        sacp = np.asarray(sched.sqrt_alphas_cumprod_prev)

        x = torch.from_numpy(img0.copy())
        cond_t = torch.from_numpy(cond)
        with torch.no_grad():
            for t in reversed(range(T)):
                lvl = torch.full((1, 1), float(sacp[t + 1]))
                eps = tnet(torch.cat([cond_t, x], dim=1), lvl)
                x_recon = (
                    float(sched.sqrt_recip_alphas_cumprod[t]) * x
                    - float(sched.sqrt_recipm1_alphas_cumprod[t]) * eps
                ).clamp(-1.0, 1.0)
                mean = (
                    float(sched.posterior_mean_coef1[t]) * x_recon
                    + float(sched.posterior_mean_coef2[t]) * x
                )
                lv = float(sched.posterior_log_variance_clipped[t])
                nz = torch.from_numpy(noises[t]) if t > 0 else torch.zeros_like(x)
                x = mean + nz * np.exp(0.5 * lv)
        theirs = x.numpy()

        from srewd_tpu.diffusion.gaussian import predict_start_from_noise, q_posterior

        cond_j = jnp.asarray(np.transpose(cond, (0, 2, 3, 1)))
        x_j = jnp.asarray(np.transpose(img0, (0, 2, 3, 1)))
        for t in reversed(range(T)):
            lvl = jnp.broadcast_to(sched.sqrt_alphas_cumprod_prev[t + 1], (1,))
            eps = jnet.apply(
                {"params": params},
                jnp.concatenate([cond_j, x_j], axis=-1),
                lvl,
                train=False,
            )
            x_recon = jnp.clip(predict_start_from_noise(sched, x_j, t, eps), -1, 1)
            mean, log_var = q_posterior(sched, x_recon, x_j, t)
            nz = (jnp.asarray(np.transpose(noises[t], (0, 2, 3, 1)))
                  if t > 0 else jnp.zeros_like(x_j))
            x_j = mean + nz * jnp.exp(0.5 * log_var)
        ours = np.transpose(np.asarray(x_j), (0, 3, 1, 2))

        rel_rmse = np.sqrt(np.mean((ours - theirs) ** 2)) / (
            np.sqrt(np.mean(theirs**2)) + 1e-12
        )
        # BASELINE.md accuracy gate: <=1e-3 relative RMSE vs reference
        assert rel_rmse < 1e-3, f"weight-level chain relative RMSE {rel_rmse}"
