"""Weight-level parity: reference resdiff/phydiff/srdiff/physrdiff UNets.

Extends tests/test_parity_reference.py's sr3 TestWeightLevelParity to the
other four architectures: the reference torch UNet is built on CPU (via
tests/torch_ref_helpers — cuda->cpu rewriting + an exact Haar stand-in for
the absent pytorch_wavelets), its state_dict converted with
srewd_tpu.utils.torch_convert.convert_unet_state, and forward + T-step
reverse-chain outputs compared against WeatherUNet with the same weights.

physrdiff: the reference forward is unrunnable as written (undefined
`self.fd_spliter`, physrdiff/unet.py:150, and sum-queries fed to a CA built
for 3 wavelet components, :86 vs :148). The parity target is the reference
module patched with exactly those two evident-intent fixes (spliter member
injected from resdiff's real FD_Info_Spliter; concat queries), which is what
our variant implements (srewd_tpu/models/unet.py docstring).

Batch size 1 where the FD spliter is involved: the reference applies
torch.fft.fftn over ALL dims including batch (fd_info_spliter.py:63); we
transform spatially only (documented deviation), and the two coincide at
B=1, C=1.
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")

from torch_ref_helpers import cuda_to_cpu, install_pytorch_wavelets_stub  # noqa: E402

install_pytorch_wavelets_stub()

try:
    from models.diffusion_models.resdiff.unet import UNet as ResdiffTorchUNet  # noqa: E402
except Exception:  # pragma: no cover
    pytest.skip("reference repo not importable", allow_module_level=True)

from models.diffusion_models.phydiff.unet import UNet as PhydiffTorchUNet  # noqa: E402
from models.diffusion_models.physrdiff.unet import UNet as PhysrdiffTorchUNet  # noqa: E402
from models.diffusion_models.resdiff.fd_info_spliter import FD_Info_Spliter  # noqa: E402
from models.diffusion_models.srdiff.unet import UNet as SrdiffTorchUNet  # noqa: E402

from srewd_tpu.diffusion.gaussian import predict_start_from_noise, q_posterior  # noqa: E402
from srewd_tpu.diffusion.schedule import Schedule  # noqa: E402
from srewd_tpu.models.unet import WeatherUNet  # noqa: E402
from srewd_tpu.utils.torch_convert import convert_unet_state, merge_with_init  # noqa: E402

H, W, C = 16, 32, 1
T = 20
MULTS = (1, 2)
N_BOUNDARIES = len(MULTS) - 1  # CrossAttention modules actually used


def nhwc(a):
    return np.transpose(a, (0, 2, 3, 1))


def nchw(a):
    return np.transpose(np.asarray(a), (0, 3, 1, 2))


def _filter_unused_ca(tree):
    """Reference modules register J=4 HF_guided_CA blocks but only use one
    per downsample boundary (resdiff/unet.py:73-77 vs :155-163); drop the
    converted-but-unused ones so the tree matches our (1,2)-mult model."""
    return {
        k: v
        for k, v in tree.items()
        if not (k.startswith("CrossAttention_") and int(k.split("_")[1]) >= N_BOUNDARIES)
    }


def _check_structure(jnet, params, init_args, init_kwargs=None):
    ref_tree = jnet.init(jax.random.key(0), *init_args, **(init_kwargs or {}))["params"]
    flat_ref = jax.tree_util.tree_flatten_with_path(ref_tree)[0]
    flat_got = jax.tree_util.tree_flatten_with_path(params)[0]

    def by_name(flat):
        return sorted((jax.tree_util.keystr(p), v.shape) for p, v in flat)

    ref_names, got_names = by_name(flat_ref), by_name(flat_got)
    assert len(ref_names) == len(got_names), (
        f"param count mismatch: init {len(ref_names)} vs converted {len(got_names)}\n"
        f"missing: {set(n for n, _ in ref_names) - set(n for n, _ in got_names)}\n"
        f"extra: {set(n for n, _ in got_names) - set(n for n, _ in ref_names)}"
    )
    for (pr, sr), (pg, sg) in zip(ref_names, got_names):
        assert pr == pg and sr == sg, (pr, sr, pg, sg)


def _chain_parity(eps_torch, eps_jax, shape, seed):
    """Shared-noise T-step reverse chain, reference math both sides."""
    sched = Schedule.create(schedule="linear", n_timestep=T,
                            linear_start=1e-6, linear_end=1e-2)
    rng = np.random.default_rng(seed)
    img0 = rng.standard_normal(shape).astype(np.float32)
    noises = [rng.standard_normal(shape).astype(np.float32) for _ in range(T)]
    sacp = np.asarray(sched.sqrt_alphas_cumprod_prev)

    x = torch.from_numpy(img0.copy())
    with torch.no_grad(), cuda_to_cpu():
        for t in reversed(range(T)):
            lvl = torch.full((shape[0], 1), float(sacp[t + 1]))
            eps = eps_torch(x, lvl)
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

    x_j = jnp.asarray(nhwc(img0))
    for t in reversed(range(T)):
        lvl = jnp.broadcast_to(sched.sqrt_alphas_cumprod_prev[t + 1], (shape[0],))
        eps = eps_jax(x_j, lvl)
        x_recon = jnp.clip(predict_start_from_noise(sched, x_j, t, eps), -1, 1)
        mean, log_var = q_posterior(sched, x_recon, x_j, t)
        nz = jnp.asarray(nhwc(noises[t])) if t > 0 else jnp.zeros_like(x_j)
        x_j = mean + nz * jnp.exp(0.5 * log_var)
    ours = nchw(x_j)

    rel_rmse = np.sqrt(np.mean((ours - theirs) ** 2)) / (
        np.sqrt(np.mean(theirs**2)) + 1e-12
    )
    # BASELINE.md accuracy gate: <=1e-3 relative RMSE vs reference
    assert rel_rmse < 1e-3, f"weight-level chain relative RMSE {rel_rmse}"


def _forward_rel_err(theirs, ours_nhwc):
    ours = nchw(ours_nhwc)
    return np.max(np.abs(ours - theirs)) / (np.max(np.abs(theirs)) + 1e-12)


# --------------------------------------------------------------------- resdiff
class TestResdiffParity:
    """reference resdiff/unet.py: FD spliter + HF-guided CA on skips."""

    @pytest.fixture(scope="class")
    def pair(self):
        torch.manual_seed(1)
        with cuda_to_cpu():
            tnet = ResdiffTorchUNet(
                in_channel=5 * C, out_channel=C, inner_channel=32, norm_groups=32,
                channel_mults=MULTS, attn_res=(8,), res_blocks=2, dropout=0,
                image_height=H, image_width=W, image_channels=C,
            )
        tnet.eval()
        params = jax.tree.map(
            jnp.asarray, _filter_unused_ca(convert_unet_state(tnet.state_dict(), "resdiff"))
        )
        jnet = WeatherUNet(
            variant="resdiff", in_channel=2 * C, out_channel=C, inner_channel=32,
            norm_groups=32, channel_mults=MULTS, attn_res=(8,), res_blocks=2,
            dropout=0.0, image_height=H, image_width=W, image_channels=C,
        )
        _check_structure(jnet, params, (jnp.zeros((1, H, W, 2 * C)), jnp.ones((1,))))
        return tnet, jnet, params

    def test_forward_parity(self, pair):
        tnet, jnet, params = pair
        rng = np.random.default_rng(11)
        x = rng.standard_normal((1, 2 * C, H, W)).astype(np.float32)
        lvl = np.asarray([0.71], np.float32)
        with torch.no_grad(), cuda_to_cpu():
            theirs = tnet(torch.from_numpy(x), torch.from_numpy(lvl).reshape(1, 1)).numpy()
        ours = jnet.apply({"params": params}, jnp.asarray(nhwc(x)), jnp.asarray(lvl),
                          train=False)
        rel = _forward_rel_err(theirs, ours)
        assert rel < 1e-4, f"resdiff forward rel max err {rel}"

    def test_chain_parity(self, pair):
        tnet, jnet, params = pair
        rng = np.random.default_rng(12)
        cond = rng.standard_normal((1, C, H, W)).astype(np.float32)
        cond_t, cond_j = torch.from_numpy(cond), jnp.asarray(nhwc(cond))
        _chain_parity(
            lambda x, lvl: tnet(torch.cat([cond_t, x], dim=1), lvl),
            lambda x, lvl: jnet.apply(
                {"params": params}, jnp.concatenate([cond_j, x], axis=-1), lvl, train=False
            ),
            (1, C, H, W), seed=13,
        )


# --------------------------------------------------------------------- phydiff
class TestPhydiffParity:
    """reference phydiff/unet.py: FD stencils input + 3-component CA queries."""

    @pytest.fixture(scope="class")
    def pair(self):
        torch.manual_seed(2)
        with cuda_to_cpu():  # HF_guided_CA norm is .to('cuda') in its ctor
            tnet = PhydiffTorchUNet(
                in_channel=2 * C + 3, out_channel=C, inner_channel=32, norm_groups=32,
                channel_mults=MULTS, attn_res=(8,), res_blocks=2, dropout=0,
                image_height=H, image_width=W, image_channels=C, device="cpu",
            )
        tnet.eval()
        params = jax.tree.map(
            jnp.asarray, _filter_unused_ca(convert_unet_state(tnet.state_dict(), "phydiff"))
        )
        jnet = WeatherUNet(
            variant="phydiff", in_channel=2 * C, out_channel=C, inner_channel=32,
            norm_groups=32, channel_mults=MULTS, attn_res=(8,), res_blocks=2,
            dropout=0.0, image_height=H, image_width=W, image_channels=C,
        )
        _check_structure(jnet, params, (jnp.zeros((2, H, W, 2 * C)), jnp.ones((2,))))
        return tnet, jnet, params

    def test_forward_parity(self, pair):
        tnet, jnet, params = pair
        rng = np.random.default_rng(21)
        x = rng.standard_normal((2, 2 * C, H, W)).astype(np.float32)
        lvl = np.asarray([0.71, 0.33], np.float32)
        with torch.no_grad(), cuda_to_cpu():
            theirs = tnet(torch.from_numpy(x), torch.from_numpy(lvl).reshape(2, 1)).numpy()
        ours = jnet.apply({"params": params}, jnp.asarray(nhwc(x)), jnp.asarray(lvl),
                          train=False)
        rel = _forward_rel_err(theirs, ours)
        assert rel < 1e-4, f"phydiff forward rel max err {rel}"

    def test_chain_parity(self, pair):
        tnet, jnet, params = pair
        rng = np.random.default_rng(22)
        cond = rng.standard_normal((1, C, H, W)).astype(np.float32)
        cond_t, cond_j = torch.from_numpy(cond), jnp.asarray(nhwc(cond))
        _chain_parity(
            lambda x, lvl: tnet(torch.cat([cond_t, x], dim=1), lvl),
            lambda x, lvl: jnet.apply(
                {"params": params}, jnp.concatenate([cond_j, x], axis=-1), lvl, train=False
            ),
            (1, C, H, W), seed=23,
        )


# --------------------------------------------------------------------- srdiff
def _rrdb_feats(rng, b):
    """18 random RRDB feature maps [B,64,h/4,w/4] (RRDBNet get_fea taps)."""
    return [
        torch.from_numpy(rng.standard_normal((b, 64, H // 4, W // 4)).astype(np.float32))
        for _ in range(18)
    ]


class TestSrdiffParity:
    """reference srdiff/unet.py: Mish MLP + RRDB cond_proj injection at i==2."""

    @pytest.fixture(scope="class")
    def pair(self):
        torch.manual_seed(3)
        tnet = SrdiffTorchUNet(
            in_channel=C, out_channel=C, inner_channel=64, norm_groups=32,
            channel_mults=MULTS, attn_res=(8,), res_blocks=2, dropout=0,
            image_height=H, image_width=W, image_channels=C,
        )
        tnet.eval()
        params = jax.tree.map(jnp.asarray, convert_unet_state(tnet.state_dict(), "srdiff"))
        jnet = WeatherUNet(
            variant="srdiff", in_channel=C, out_channel=C, inner_channel=64,
            norm_groups=32, channel_mults=MULTS, attn_res=(8,), res_blocks=2,
            dropout=0.0, image_height=H, image_width=W, image_channels=C,
        )
        feats0 = jnp.zeros((1, H // 4, W // 4, 64 * 6))
        _check_structure(
            jnet, params, (jnp.zeros((1, H, W, C)), jnp.ones((1,))),
            {"rrdb_feats": feats0},
        )
        return tnet, jnet, params

    def test_forward_parity(self, pair):
        tnet, jnet, params = pair
        rng = np.random.default_rng(31)
        feats = _rrdb_feats(rng, 2)
        x = rng.standard_normal((2, C, H, W)).astype(np.float32)
        lvl = np.asarray([0.66, 0.21], np.float32)
        with torch.no_grad():
            theirs = tnet((feats, torch.from_numpy(x)),
                          torch.from_numpy(lvl).reshape(2, 1)).numpy()
        feats_j = jnp.asarray(nhwc(torch.cat([feats[i] for i in range(2, 18, 3)], 1).numpy()))
        ours = jnet.apply({"params": params}, jnp.asarray(nhwc(x)), jnp.asarray(lvl),
                          rrdb_feats=feats_j, train=False)
        rel = _forward_rel_err(theirs, ours)
        assert rel < 1e-4, f"srdiff forward rel max err {rel}"

    def test_chain_parity(self, pair):
        tnet, jnet, params = pair
        rng = np.random.default_rng(32)
        feats = _rrdb_feats(rng, 1)
        feats_j = jnp.asarray(nhwc(torch.cat([feats[i] for i in range(2, 18, 3)], 1).numpy()))
        _chain_parity(
            lambda x, lvl: tnet((feats, x), lvl),
            lambda x, lvl: jnet.apply(
                {"params": params}, x, lvl, rrdb_feats=feats_j, train=False
            ),
            (1, C, H, W), seed=33,
        )


# ------------------------------------------------------------------- physrdiff
def _patched_physrdiff_forward(tnet, x_tuple, time):
    """The reference physrdiff forward (physrdiff/unet.py:133-181) with its
    two latent bugs fixed as our variant documents: (1) fd_spliter injected
    (undefined member, :150), (2) 3-component concat queries to match the
    wavelet_components=3 CA construction (:86; the written sum at :148 has
    the wrong channel count). Everything else drives the reference's own
    module objects."""
    import pytorch_wavelets as pw
    from models.diffusion_models.nn_modules.resnet import ResnetBlocWithAttn

    t = tnet.noise_level_mlp(time)
    interpolated_img, rrdb_encoded, x = x_tuple
    cond = tnet.cond_proj(torch.cat(rrdb_encoded[2::3], 1))

    x_dwt = pw.DWTForward(J=tnet.J, wave="haar", mode="symmetric")(interpolated_img)[1]
    dwt_img_list = [
        torch.cat([x_dwt[i][:, :, 0], x_dwt[i][:, :, 1], x_dwt[i][:, :, 2]], dim=1)
        for i in range(tnet.J)
    ]  # evident-intent fix (2): concat, not sum

    x = tnet.fd_spliter(torch.cat([interpolated_img, x], dim=1), t)
    feats, idx = [], 0
    for i, layer in enumerate(tnet.downs):
        x = layer(x, t) if isinstance(layer, ResnetBlocWithAttn) else layer(x)
        if i == 2:
            x = x + cond
        if len(feats) != 0 and feats[-1].shape[2:] != x.shape[2:]:
            feats.append(tnet.hf_ca_list[idx](x, dwt_img_list[idx]))
            idx += 1
        else:
            feats.append(x)
    for layer in tnet.mid:
        x = layer(x, t) if isinstance(layer, ResnetBlocWithAttn) else layer(x)
    for layer in tnet.ups:
        if isinstance(layer, ResnetBlocWithAttn):
            x = layer(torch.cat((x, feats.pop()), dim=1), t)
        else:
            x = layer(x)
    return tnet.final_conv(x)


class TestPhysrdiffParity:
    """physrdiff = srdiff cond_proj + resdiff spliter + CA (evident intent)."""

    @pytest.fixture(scope="class")
    def pair(self):
        torch.manual_seed(4)
        with cuda_to_cpu():  # ctor creates FD kernels with device='cuda' (:45)
            tnet = PhysrdiffTorchUNet(
                in_channel=5 * C, out_channel=C, inner_channel=64, norm_groups=32,
                channel_mults=MULTS, attn_res=(8,), res_blocks=2, dropout=0,
                image_height=H, image_width=W, image_channels=C,
            )
            # evident-intent fix (1): the member the reference forward uses
            tnet.fd_spliter = FD_Info_Spliter(
                dim=64, in_channels=C, out_channels=C, image_height=H, image_width=W
            )
        tnet.eval()
        converted = _filter_unused_ca(convert_unet_state(tnet.state_dict(), "physrdiff"))
        jnet = WeatherUNet(
            variant="physrdiff", in_channel=2 * C, out_channel=C, inner_channel=64,
            norm_groups=32, channel_mults=MULTS, attn_res=(8,), res_blocks=2,
            dropout=0.0, image_height=H, image_width=W, image_channels=C,
        )
        feats0 = jnp.zeros((1, H // 4, W // 4, 64 * 6))
        init_tree = jnet.init(
            jax.random.key(0), jnp.zeros((1, H, W, 2 * C)), jnp.ones((1,)),
            rrdb_feats=feats0,
        )["params"]
        params = jax.tree.map(jnp.asarray, merge_with_init(converted, init_tree))
        _check_structure(
            jnet, params, (jnp.zeros((1, H, W, 2 * C)), jnp.ones((1,))),
            {"rrdb_feats": feats0},
        )
        return tnet, jnet, params

    def test_spliter_in_converted_tree(self, pair):
        """With the injected spliter, its weights ARE converted (not init)."""
        tnet, jnet, params = pair
        got = np.asarray(params["FDInfoSpliter_0"]["Dense_0"]["kernel"])
        want = tnet.fd_spliter.noise_func.weight.detach().numpy().T
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_forward_parity(self, pair):
        tnet, jnet, params = pair
        rng = np.random.default_rng(41)
        feats = _rrdb_feats(rng, 1)
        interp = rng.standard_normal((1, C, H, W)).astype(np.float32)
        x = rng.standard_normal((1, C, H, W)).astype(np.float32)
        lvl = np.asarray([0.58], np.float32)
        with torch.no_grad():
            theirs = _patched_physrdiff_forward(
                tnet, (torch.from_numpy(interp), feats, torch.from_numpy(x)),
                torch.from_numpy(lvl).reshape(1, 1),
            ).numpy()
        feats_j = jnp.asarray(nhwc(torch.cat([feats[i] for i in range(2, 18, 3)], 1).numpy()))
        ours = jnet.apply(
            {"params": params},
            jnp.concatenate([jnp.asarray(nhwc(interp)), jnp.asarray(nhwc(x))], axis=-1),
            jnp.asarray(lvl), rrdb_feats=feats_j, train=False,
        )
        rel = _forward_rel_err(theirs, ours)
        assert rel < 1e-4, f"physrdiff forward rel max err {rel}"

    def test_chain_parity(self, pair):
        tnet, jnet, params = pair
        rng = np.random.default_rng(42)
        feats = _rrdb_feats(rng, 1)
        interp = rng.standard_normal((1, C, H, W)).astype(np.float32)
        interp_t, interp_j = torch.from_numpy(interp), jnp.asarray(nhwc(interp))
        feats_j = jnp.asarray(nhwc(torch.cat([feats[i] for i in range(2, 18, 3)], 1).numpy()))
        _chain_parity(
            lambda x, lvl: _patched_physrdiff_forward(tnet, (interp_t, feats, x), lvl),
            lambda x, lvl: jnet.apply(
                {"params": params}, jnp.concatenate([interp_j, x], axis=-1), lvl,
                rrdb_feats=feats_j, train=False,
            ),
            (1, C, H, W), seed=43,
        )
