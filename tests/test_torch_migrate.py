"""Checkpoint migration from the reference: encoders + full _gen.pth + CLI.

Pins the weight-level behavior of the encoder converters
(srewd_tpu/utils/torch_convert.convert_rrdb_state /
convert_simple_cnn_state) against the reference modules run on CPU, the
`denoise_fn.*`/buffer/encoder splitting of convert_diffusion_checkpoint
(reference DDPM.save_network layout, model.py:183-186), and drives
scripts/convert_torch_checkpoint.py end-to-end: a reference-format
I{iter}_E{epoch}_gen.pth becomes an orbax checkpoint that
`path.resume_state` restores with the converted weights in place.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")

try:
    from models.rrdb_encoder.RRDBNet import RRDBNet as TorchRRDBNet  # noqa: E402
except Exception:  # pragma: no cover
    pytest.skip("reference repo not importable", allow_module_level=True)

from models.diffusion_models.diffusion import GaussianDiffusion  # noqa: E402
from models.diffusion_models.sr3.unet import UNet as Sr3TorchUNet  # noqa: E402
from models.simple_cnn.Simple_CNN import SimpleCNN as TorchSimpleCNN  # noqa: E402

from srewd_tpu.models.rrdb import RRDBNet  # noqa: E402
from srewd_tpu.models.simple_cnn import SimpleCNN  # noqa: E402
from srewd_tpu.utils.torch_convert import (  # noqa: E402
    convert_diffusion_checkpoint,
    convert_rrdb_state,
    convert_simple_cnn_state,
    convert_sr3_unet_state,
)


def nhwc(a):
    return np.transpose(a, (0, 2, 3, 1))


def nchw(a):
    return np.transpose(np.asarray(a), (0, 3, 1, 2))


class TestEncoderConverters:
    def test_rrdb_forward_and_features(self):
        torch.manual_seed(11)
        tnet = TorchRRDBNet(1, 1, 16, 2, 8)  # in, out, nf, nb, gc
        tnet.eval()
        jnet = RRDBNet(in_nc=1, out_nc=1, nf=16, nb=2, gc=8)
        params = jax.tree.map(jnp.asarray, convert_rrdb_state(tnet.state_dict()))

        rng = np.random.default_rng(0)
        x = (rng.uniform(-1, 1, (2, 1, 8, 16))).astype(np.float32)
        with torch.no_grad():
            t_out, t_feas = tnet(torch.from_numpy(x), get_fea=True)
        j_out, j_feas = jnet.apply({"params": params}, jnp.asarray(nhwc(x)),
                                   get_fea=True)
        np.testing.assert_allclose(nchw(j_out), t_out.numpy(), atol=2e-5)
        assert len(j_feas) == len(t_feas) == 3  # nb blocks + trunk skip
        for tf, jf in zip(t_feas, j_feas):
            np.testing.assert_allclose(nchw(jf), tf.numpy(), atol=2e-5)

    def test_simple_cnn_forward(self):
        torch.manual_seed(12)
        tnet = TorchSimpleCNN(scale_factor=4, channels=1)
        tnet.eval()
        jnet = SimpleCNN(scale_factor=4, channels=1)
        params = jax.tree.map(jnp.asarray, convert_simple_cnn_state(tnet.state_dict()))

        rng = np.random.default_rng(1)
        x = rng.standard_normal((2, 1, 8, 16)).astype(np.float32)
        with torch.no_grad():
            theirs = tnet(torch.from_numpy(x)).numpy()
        ours = nchw(jnet.apply({"params": params}, jnp.asarray(nhwc(x))))
        np.testing.assert_allclose(ours, theirs, atol=2e-5)


def _tiny_torch_gen_state():
    """Reference-format _gen.pth contents: SR3-style GaussianDiffusion
    (denoise_fn = sr3 UNet) with schedule buffers registered."""
    torch.manual_seed(13)
    unet = Sr3TorchUNet(
        in_channel=2, out_channel=1, inner_channel=16, norm_groups=8,
        channel_mults=(1, 2), attn_res=(8,), res_blocks=1, dropout=0,
        image_height=32, image_width=64, image_channels=1,
    )
    diff = GaussianDiffusion(unet, channels=1, image_height=32, image_width=64)
    diff.set_new_noise_schedule(
        {"schedule": "linear", "n_timestep": 30,
         "linear_start": 1e-6, "linear_end": 1e-2}, "cpu")
    return unet, diff.state_dict()


class TestDiffusionCheckpointSplit:
    def test_split_matches_direct_unet_conversion(self):
        unet, sd = _tiny_torch_gen_state()
        out = convert_diffusion_checkpoint(sd, "sr3")
        assert set(out) == {"unet"}
        direct = convert_sr3_unet_state(unet.state_dict())
        def named(tree):
            flat = jax.tree_util.tree_flatten_with_path(tree)[0]
            return sorted((jax.tree_util.keystr(p), v) for p, v in flat)

        flat_a, flat_b = named(out["unet"]), named(direct)
        assert len(flat_a) == len(flat_b)
        for (pa, va), (pb, vb) in zip(flat_a, flat_b):
            assert pa == pb
            np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))

    def test_unknown_key_raises(self):
        _, sd = _tiny_torch_gen_state()
        sd["mystery.weight"] = torch.zeros(1)
        with pytest.raises(ValueError, match="unrecognized"):
            convert_diffusion_checkpoint(sd, "sr3")

    def test_drop_unused_cross_attention(self):
        """The reference registers J=4 hf_ca_list modules but uses only
        len(channel_mults)-1 (resdiff/unet.py:72-76); the converter must drop
        the unused ones or merge_with_init rejects the tree (ADVICE r2)."""
        from srewd_tpu.utils.torch_convert import (
            drop_unused_cross_attention,
            merge_with_init,
        )

        leaf = {"kernel": np.zeros((1, 1, 4, 4), np.float32)}
        tree = {f"CrossAttention_{i}": dict(leaf) for i in range(4)}
        tree["Conv_0"] = dict(leaf)
        out = drop_unused_cross_attention(tree, 1)  # 2 mults -> 1 boundary
        assert set(out) == {"CrossAttention_0", "Conv_0"}
        # the un-dropped tree reproduces the CLI failure; dropped merges fine
        init = {"CrossAttention_0": dict(leaf), "Conv_0": dict(leaf)}
        with pytest.raises(ValueError, match="not in model"):
            merge_with_init(tree, init)
        merge_with_init(out, init)


class TestMigrationCLI:
    def test_end_to_end(self, tmp_path):
        unet, sd = _tiny_torch_gen_state()
        gen = tmp_path / "I30_E2_gen.pth"
        torch.save(sd, str(gen))

        cfg = {
            "name": "migrate_test", "phase": "val",
            "path": {"experiments_folder_path": str(tmp_path / "exp"),
                     "log": "logs", "tb_logger": "tb", "results": "results",
                     "checkpoint": "checkpoint", "resume_state": None},
            "data": {"name": "WeatherBench", "dataroot": str(tmp_path),
                     "variables": ["t2m"]},
            "model": {
                "model_name": "diffusion", "architecture": "sr3",
                "finetune_norm": False,
                "unet": {"in_channel": 2, "out_channel": 1, "inner_channel": 16,
                         "norm_groups": 8, "channel_multiplier": [1, 2],
                         "attn_res": [8], "res_blocks": 1, "dropout": 0.0},
                "beta_schedule": {
                    "train": {"schedule": "linear", "n_timestep": 30,
                              "linear_start": 1e-6, "linear_end": 0.01}},
                "diffusion": {"image_height": 32, "image_width": 64,
                              "image_channels": 1, "channels": 1,
                              "conditional": True},
                "pretrained_model": {"model_path": None, "lock_weights": True},
            },
            "train": {"optimizer": {"type": "adam", "lr": 1e-4},
                      "ema_scheduler": {"enabled": False}},
            "wandb": {"project": None, "entity": None},
        }
        cfg_path = tmp_path / "cfg.json"
        cfg_path.write_text(json.dumps(cfg))

        out_dir = tmp_path / "converted"
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        r = subprocess.run(
            [sys.executable, os.path.join(repo, "scripts/convert_torch_checkpoint.py"),
             "-c", str(cfg_path), "--gen", str(gen), "--out", str(out_dir)],
            capture_output=True, text=True, timeout=600, cwd=repo,
            env=dict(os.environ, JAX_PLATFORMS="cpu"),
        )
        assert r.returncode == 0, r.stderr[-3000:]
        ckpt = str(out_dir / "I30_E2")
        assert os.path.isdir(ckpt), r.stdout

        import orbax.checkpoint as ocp

        state = ocp.StandardCheckpointer().restore(ckpt)
        assert int(state["step"]) == 30 and int(state["epoch"]) == 2
        # a converted leaf survives the round trip bit-exactly
        want = unet.state_dict()["downs.0.weight"].numpy().transpose(2, 3, 1, 0)
        got = np.asarray(state["params"]["unet"]["Conv_0"]["kernel"])
        np.testing.assert_array_equal(got, want)

    def test_encoder_checkpoint(self, tmp_path):
        torch.manual_seed(14)
        tnet = TorchSimpleCNN(scale_factor=4, channels=1)
        gen = tmp_path / "pretrain_cnn_E5_gen.pth"
        torch.save(tnet.state_dict(), str(gen))
        cfg_path = tmp_path / "cfg.json"
        cfg_path.write_text(json.dumps({
            "name": "enc_test", "phase": "val",
            "path": {"experiments_folder_path": str(tmp_path / "exp"),
                     "log": "logs", "tb_logger": "tb", "results": "results",
                     "checkpoint": "checkpoint", "resume_state": None},
            "data": {"name": "WeatherBench", "dataroot": str(tmp_path),
                     "variables": ["t2m"]},
            "model": {"model_name": "diffusion", "architecture": "sr3",
                      "unet": {}, "beta_schedule": {
                          "train": {"schedule": "linear", "n_timestep": 30,
                                    "linear_start": 1e-6, "linear_end": 0.01}},
                      "diffusion": {"image_height": 32, "image_width": 64,
                                    "image_channels": 1, "channels": 1}},
            "train": {"optimizer": {"type": "adam", "lr": 1e-4}},
            "wandb": {"project": None, "entity": None},
        }))
        out_dir = tmp_path / "enc"
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        r = subprocess.run(
            [sys.executable, os.path.join(repo, "scripts/convert_torch_checkpoint.py"),
             "-c", str(cfg_path), "--gen", str(gen), "--out", str(out_dir),
             "--encoder"],
            capture_output=True, text=True, timeout=600, cwd=repo,
            env=dict(os.environ, JAX_PLATFORMS="cpu"),
        )
        assert r.returncode == 0, r.stderr[-3000:]
        path = str(out_dir / "pretrain_cnn_E5_gen")
        assert os.path.isdir(path)

        from srewd_tpu.training.pretrainer import load_encoder_params

        params = load_encoder_params(path)
        want = tnet.state_dict()["conv1.weight"].numpy().transpose(2, 3, 1, 0)
        np.testing.assert_array_equal(
            np.asarray(params["Conv_0"]["kernel"]), want)
