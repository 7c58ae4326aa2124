"""Weight-level forward parity at the PRODUCTION problem size (128x256).

The toy-size parity suites (tests/test_parity_reference.py at 16x32,
tests/test_parity_archs.py) pin per-arch numerics but leave open whether
error grows with depth/resolution at the real operating point: t2m
128x256, inner_channel=64, channel_mults (1,2,4,8,8), attn at 16,
res_blocks=2 (configs/experiment_configs/*, reference
configs/experiment_configs/phydiff/resdiff+physics_train_example.json:41-48).

This file runs ONE full-size forward (batch 1, f32) through the reference
torch UNet and WeatherUNet with converted weights for the two headline
architectures: sr3 (the benchmark trunk) and phydiff (the thesis
architecture, with FD stencils + 4 HF-guided CA boundaries, the largest at
64x128 = 8192 tokens). A T-step chain at this size is minutes of torch-CPU
time, so the chain-accumulation gate stays at toy size; forward error here
bounds the per-step divergence that the chain test integrates.
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
    from models.diffusion_models.sr3.unet import UNet as Sr3TorchUNet  # noqa: E402
except Exception:  # pragma: no cover
    pytest.skip("reference repo not importable", allow_module_level=True)

from models.diffusion_models.phydiff.unet import UNet as PhydiffTorchUNet  # noqa: E402

from srewd_tpu.models.unet import WeatherUNet  # noqa: E402
from srewd_tpu.utils.torch_convert import (  # noqa: E402
    convert_sr3_unet_state,
    convert_unet_state,
)

H, W = 128, 256
INNER = 64
MULTS = (1, 2, 4, 8, 8)
ATTN = (16,)


def nhwc(a):
    return np.transpose(a, (0, 2, 3, 1))


def nchw(a):
    return np.transpose(np.asarray(a), (0, 3, 1, 2))


def _rel_errs(theirs, ours_nhwc):
    ours = nchw(ours_nhwc)
    rel_max = np.max(np.abs(ours - theirs)) / (np.max(np.abs(theirs)) + 1e-12)
    rel_rmse = np.sqrt(np.mean((ours - theirs) ** 2)) / (
        np.sqrt(np.mean(theirs**2)) + 1e-12
    )
    return rel_max, rel_rmse


class TestSr3Production:
    def test_forward_parity_full_size(self):
        torch.manual_seed(7)
        tnet = Sr3TorchUNet(
            in_channel=2, out_channel=1, inner_channel=INNER, norm_groups=32,
            channel_mults=MULTS, attn_res=ATTN, res_blocks=2, dropout=0,
            image_height=H, image_width=W, image_channels=1,
        )
        tnet.eval()
        params = jax.tree.map(jnp.asarray, convert_sr3_unet_state(tnet.state_dict()))
        jnet = WeatherUNet(
            variant="sr3", in_channel=2, out_channel=1, inner_channel=INNER,
            norm_groups=32, channel_mults=MULTS, attn_res=ATTN, res_blocks=2,
            dropout=0.0, image_height=H, image_width=W, image_channels=1,
        )
        rng = np.random.default_rng(70)
        x = rng.standard_normal((1, 2, H, W)).astype(np.float32)
        lvl = np.asarray([0.63], np.float32)
        with torch.no_grad():
            theirs = tnet(torch.from_numpy(x), torch.from_numpy(lvl).reshape(1, 1)).numpy()
        ours = jnet.apply({"params": params}, jnp.asarray(nhwc(x)), jnp.asarray(lvl),
                          train=False)
        rel_max, rel_rmse = _rel_errs(theirs, ours)
        # BASELINE.md accuracy gate (<=1e-3 rel RMSE) at the real size
        assert rel_rmse < 1e-3, f"sr3 production rel RMSE {rel_rmse}"
        assert rel_max < 1e-3, f"sr3 production rel max err {rel_max}"


class TestPhydiffProduction:
    def test_forward_parity_full_size(self):
        torch.manual_seed(8)
        with cuda_to_cpu():  # HF_guided_CA norm is .to('cuda') in its ctor
            tnet = PhydiffTorchUNet(
                in_channel=2 + 3, out_channel=1, inner_channel=INNER, norm_groups=32,
                channel_mults=MULTS, attn_res=ATTN, res_blocks=2, dropout=0,
                image_height=H, image_width=W, image_channels=1, device="cpu",
            )
        tnet.eval()
        # all 4 registered CA blocks are used at 5 levels (4 boundaries)
        params = jax.tree.map(
            jnp.asarray, convert_unet_state(tnet.state_dict(), "phydiff")
        )
        jnet = WeatherUNet(
            variant="phydiff", in_channel=2, out_channel=1, inner_channel=INNER,
            norm_groups=32, channel_mults=MULTS, attn_res=ATTN, res_blocks=2,
            dropout=0.0, image_height=H, image_width=W, image_channels=1,
        )
        rng = np.random.default_rng(80)
        x = rng.standard_normal((1, 2, H, W)).astype(np.float32)
        lvl = np.asarray([0.44], np.float32)
        with torch.no_grad(), cuda_to_cpu():
            theirs = tnet(torch.from_numpy(x), torch.from_numpy(lvl).reshape(1, 1)).numpy()
        ours = jnet.apply({"params": params}, jnp.asarray(nhwc(x)), jnp.asarray(lvl),
                          train=False)
        rel_max, rel_rmse = _rel_errs(theirs, ours)
        assert rel_rmse < 1e-3, f"phydiff production rel RMSE {rel_rmse}"
        assert rel_max < 1e-3, f"phydiff production rel max err {rel_max}"
